package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one registered query: wall, executor
  * CPU, shuffle write/read bytes — the byte-level lens the plan
  * string doesn't give (the r5 lesson: `.explain` looked clean while
  * the shuffle-byte dump exposed an exchange shipping unread
  * columns). Runs the query twice (cold excluded; stages printed for
  * the warm rep only).
  *
  * Usage: runMain graft.bench.StageDump <query> [sfDir]
  */
object StageDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    @volatile var record = false
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val m = si.taskMetrics
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%.2f " +
            f"cpuS=${m.executorCpuTime / 1e9}%.1f " +
            f"shWmb=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.1f " +
            f"shRmb=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.1f")
        }
    })
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      graft.SparkEntry.queries(name)(s, dir).explain("formatted")
    def run(): Unit =
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
    run() // cold: JIT + codegen, not representative
    Thread.sleep(500)
    record = true
    val t0 = System.nanoTime()
    run()
    Thread.sleep(500)
    println(f"[stagedump] $name warm_wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    s.stop()
  }
}
