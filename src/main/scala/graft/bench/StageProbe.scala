package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-stage wall times of the replay pipeline at one
  * parallelism level (fineStages re-runs each sub-pipeline with its
  * own action, so times overlap-count prefixes — use the DELTAS
  * between consecutive stages to localize a scaling problem).
  * Usage: SPARK_GRAFT_PROBE_CPUS=8 runMain graft.bench.StageProbe
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_PROBE_CPUS", "8").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "16").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2000000").toLong
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.default.parallelism", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    ReplayBench.run(s, n) // warm-up (JIT)
    val r = ReplayBench.run(s, n, fineStages = true)
    println(s"[stageprobe] cpus=$cpus parts=$parts urls=$n wall=${r.wallSec}")
    r.stageSec.foreach { case (k, v) => println(f"[stageprobe] $k%-28s $v%8.2fs") }
    s.stop()
  }
}
