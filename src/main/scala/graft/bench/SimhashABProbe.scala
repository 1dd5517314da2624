package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** A/B: simhashPairs persisted-fp + checkpoint (prod) vs lazy no-persist
  * (relies on AQE stage dedup unifying the two band-join sides).
  */
object SimhashABProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def docs = graft.Tables.load(s, d, "documents")
    def lazyPairs(): org.apache.spark.sql.DataFrame = {
      val fpDf = graft.ops.DedupOps.simhash(docs, "doc_id", "text")
      val banded = fpDf.select(col("doc_id"), col("simhash"),
          explode(sequence(lit(0), lit(3))).as("band_i"))
        .withColumn("band_v",
          expr("shiftright(simhash, band_i * 16)").bitwiseAND(lit(0xFFFFL)))
      val a = banded.select(col("doc_id").as("id_a"), col("simhash").as("sh_a"),
        col("band_i"), col("band_v"))
      val b = banded.select(col("doc_id").as("id_b"), col("simhash").as("sh_b"),
        col("band_i"), col("band_v"))
      a.join(b, Seq("band_i", "band_v"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
        .where(col("hamming") <= 3)
        .distinct()
    }
    (1 to 4).foreach { i =>
      var t0 = System.nanoTime()
      graft.ops.DedupOps.simhashPairs(docs, "doc_id", "text", 3)
        .write.format("noop").mode("overwrite").save()
      val prod = (System.nanoTime() - t0) / 1e9
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      t0 = System.nanoTime()
      lazyPairs().write.format("noop").mode("overwrite").save()
      val lz = (System.nanoTime() - t0) / 1e9
      println(f"[simhashab] rep$i prod=$prod%.2f lazy=$lz%.2f")
    }
    s.stop()
  }
}
