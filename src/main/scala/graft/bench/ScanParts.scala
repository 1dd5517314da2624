package graft.bench
import org.apache.spark.sql.SparkSession
/** Diagnostic: report scan partition counts per table at a given SF dir. */
object ScanParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach { n =>
      val df = graft.Tables.load(s, sfDir, n)
      println(s"[scanparts] $n parts=${df.rdd.getNumPartitions} rows=${df.count()}")
    }
    s.stop()
  }
}
