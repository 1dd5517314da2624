package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: simhash fingerprint build — per-bit `ascii(substring(h,j+1,1))%2`
  * parity extraction (prod: 64 allocating 1-char substrings per row) vs
  * packing each digest's 32 parities into ONE long via
  * `conv(translate(h, hex, parityBits), 2, 10)` so the 64 sum() terms
  * become shift/and long arithmetic. Values identical by construction:
  * translate maps every hex char to its ascii-mod-2 bit ('0'..'9' →
  * 0101010101, 'a'..'f' → 101010) and conv's leftmost char is the MSB,
  * so parity_j = (p >> (31-j)) & 1.
  */
object ParityABProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 6
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def docs = graft.Tables.load(s, d, "documents")

    // identical narrow (token, cnt) build as DedupOps.simhash
    def toks = docs
      .select(col("doc_id"), array_sort(graft.ops.TextOps.tokens(col("text"))).as("__st"))
      .where(size(col("__st")) > 0)
      .withColumn("__starts", expr(
        "filter(transform(__st, (x, i) -> " +
          "IF(i = 0, 0, IF(element_at(__st, i) != x, i, -1))), b -> b >= 0)"))
      .select(col("doc_id"), explode(expr(
        "zip_with(__starts, " +
          "concat(slice(__starts, 2, size(__starts)), array(size(__st))), " +
          "(b, e) -> struct(element_at(__st, b + 1) AS tok, CAST(e - b AS BIGINT) AS cnt))"))
        .as("tc"))
      .select(col("doc_id"), col("tc.tok").as("tok"), col("tc.cnt").as("cnt"))
      .withColumn("h", md5(col("tok")))
      .withColumn("h2", md5(concat(lit("b:"), col("tok"))))

    def variantB = {
      val par = toks
        .withColumn("p1", conv(translate(col("h"),
          "0123456789abcdef", "0101010101101010"), 2, 10).cast("long"))
        .withColumn("p2", conv(translate(col("h2"),
          "0123456789abcdef", "0101010101101010"), 2, 10).cast("long"))
      val sumCols = (0 until 64).map { j =>
        val bit =
          if (j < 32) shiftright(col("p1"), 31 - j).bitwiseAND(lit(1L))
          else shiftright(col("p2"), 63 - j).bitwiseAND(lit(1L))
        sum((bit * 2 - 1) * col("cnt")).as(s"s$j")
      }
      val fp = (0 until 64).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
      par.groupBy(col("doc_id"))
        .agg(sumCols.head, sumCols.tail: _*)
        .select(col("doc_id"), fp.as("simhash"))
    }

    // one-off value-identity check before timing
    val mism = graft.ops.DedupOps.simhash(docs, "doc_id", "text").as("a")
      .join(variantB.as("b"), "doc_id")
      .where(col("a.simhash") =!= col("b.simhash")).count()
    println(s"[parityab] mismatches=$mism")
    require(mism == 0, "variant is not value-identical")

    (1 to reps).foreach { i =>
      var t0 = System.nanoTime()
      graft.ops.DedupOps.simhash(docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
      val a = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      variantB.write.format("noop").mode("overwrite").save()
      val b = (System.nanoTime() - t0) / 1e9
      println(f"[parityab] rep$i prod=$a%.2f packed=$b%.2f")
    }
    s.stop()
  }
}
