package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder

/** Diagnostic main: A/B the two embeddingLshPairs shapes (VERDICT r4
  * #5) — pair-dedup BEFORE the exact verify (both 64-long quantized
  * vectors ride the distinct exchange) vs verify-first (the distinct
  * carries 3 scalars). Prints rows, warm wall, and total shuffle
  * write/read bytes per shape.
  *
  * MEASURED at local[32] sf0.1 (quiet box, warm, 2026-08-17):
  *   dedupFirst=true  rows=493 wall=2.17s shuffleWrite=0.23MB
  *   dedupFirst=false rows=493 wall=1.32s shuffleWrite=0.01MB
  * Identical output, 23x less exchange, 1.6x faster — verify-first
  * kept as the production shape. (At 100 TB the ratio is what
  * matters: the old distinct carried 2x64 longs + 2 norms per banded
  * candidate; the new one carries 3 scalars per QUALIFYING pair.)
  */
object LshABProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.session(32, 32)
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val sw = new LongAdder; val sr = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        sw.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        sr.add(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      }
    })
    def shape(dedupFirst: Boolean) =
      graft.ops.SimilarityOps.embeddingLshPairsImpl(
        emb, "vec_id", "embedding", num = 2, den = 5,
        planes = 16, bands = 4, dims = 64, dedupFirst = dedupFirst)
    Seq(true, false).foreach { first =>
      shape(first).count() // warm (JIT/codegen/footers)
      Thread.sleep(2000)   // let the listener bus drain before reset
      sw.reset(); sr.reset()
      val t0 = System.nanoTime()
      val n = shape(first).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[lshab] dedupFirst=$first rows=$n wall=$wall%.2fs " +
        f"shuffleWrite=${sw.sum / 1e6}%.2fMB shuffleRead=${sr.sum / 1e6}%.2fMB")
    }
    spark.stop()
  }
}
