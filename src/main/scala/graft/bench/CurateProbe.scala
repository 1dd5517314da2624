package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main: stage-by-stage timing of the pipeline_curate
  * composition at sf0.1 (quality gate → LSH pairs → CC reps → kept →
  * packed windows), materializing each joint with count() so the
  * per-stage attribution is visible.
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    def mark(what: String): Unit = {
      System.err.println(f"[curate] $what ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    val dd = graft.Tables.load(s, d, "documents")
    dd.count(); mark("scan")
    graft.ops.TextOps.quality(dd, col("text")).count(); mark("quality_plain_count")
    graft.ops.TextOps.quality(dd, col("text"))
      .select("doc_id", "n_tokens", "n_stopword_kinds").count(); mark("quality_3cols")
    graft.ops.TextOps.quality(dd, col("text"))
      .where(col("n_tokens") >= 20 && col("n_stopword_kinds") >= 1).count()
    mark("quality_where")
    // the PRODUCTION pattern (see pipeline_curate): cache the computed
    // columns FIRST, filter the cache — the quality_where stage above
    // is the pitfall this avoids (Catalyst collapses the projection
    // into the filter, inlining ~80 regexp/array exprs per conjunct)
    val qq = graft.ops.TextOps.quality(dd, col("text"))
      .select("doc_id", "text", "n_tokens", "n_stopword_kinds")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = qq.where(col("n_tokens") >= 20 && col("n_stopword_kinds") >= 1)
      .select("doc_id", "text")
    q.count(); mark("quality_barrier")
    val pairs = graft.ops.DedupOps.minhashLshPairs(q, "doc_id", "text", 3, 4, 4)
    pairs.count(); mark("pairs")
    val reps = graft.ops.DedupOps.connectedComponents(q.select("doc_id"), "doc_id",
      pairs, "id_a", "id_b")
    reps.count(); mark("cc")
    val kept = q.join(
      reps.where(col("doc_id") === col("cluster_rep")).select("doc_id"), Seq("doc_id"))
    kept.count(); mark("kept")
    val packed = graft.ops.TextOps.packSequences(kept, "doc_id", "text", 512)
    val n = packed.count(); mark(s"pack (rows=$n)")
    s.stop()
  }
}
