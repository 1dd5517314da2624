package graft.bench
import org.apache.spark.sql.SparkSession

/** Ad-hoc replay profiler: runMain graft.bench.StageDebug <n> <levels-csv>.
  * Partitioning is FIXED across levels (cluster-size analogy: the job
  * and its task set stay identical; only executor slots change).
  */
object StageDebug {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val levels = args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(8, 8, 2, 8))
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "16")
    levels.foreach { level =>
      val s = SparkSession.builder().master(s"local[$level]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.default.parallelism", parts)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      val st = ReplayBench.run(s, n, fineStages = sys.env.contains("SPARK_GRAFT_FINE"))
      println(s"LEVEL=$level wall=${st.wallSec} stages=${st.stageSec.toSeq.map{case(k,v)=>f"$k=$v%.2f"}.mkString(" ")}")
      s.stop()
    }
  }
}
