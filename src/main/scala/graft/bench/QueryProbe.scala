package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic main: time ONE registered query in a fresh JVM.
  * Usage: runMain graft.bench.QueryProbe <queryName> [sfDir] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(s, sfDir).count()
      println(f"[queryprobe] $name rep$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    s.stop()
  }
}
