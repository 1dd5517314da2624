package graft.bench

import org.apache.spark.sql.SparkSession

/** Diagnostic main: time connectedComponents on a random pair graph
  * (the OpsSpec property-test shape) with per-round visibility via
  * the driver log.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val n = 60
    val ids = (0L until n.toLong).toDF("doc_id")
    val edges = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    val t0 = System.nanoTime()
    val got = graft.ops.DedupOps.connectedComponents(ids, "doc_id",
      edges.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect()
    println(f"[ccprobe] n=$n rows=${got.length} sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    s.stop()
  }
}
