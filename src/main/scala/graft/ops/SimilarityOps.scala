package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * All vectors are quantized to integers (×1000, round-to-nearest)
  * before any arithmetic: dot products and squared norms are then
  * EXACT int64 math, thresholds are exact cross-multiplied rational
  * comparisons, and the only floating op (cosine = dot/sqrt(na·nb))
  * is a single correctly-rounded IEEE op sequence — bit-identical in
  * any engine. This makes results reproducible across Spark runs,
  * partitionings, AND the DuckDB oracle, which a float-accumulation
  * dot product is not (summation order).
  *
  * Scale notes: brute force is a broadcast of the (small) query set
  * against the candidate table — a broadcast nested-loop the optimizer
  * plans without shuffling the big side; the IVF variant adds an
  * equi-join key (cluster/label) so the join becomes a shuffled hash
  * join on the bucket id, cutting candidates by the bucket fan-out.
  * Top-k per query is a window row_number over (query_id), which AQE
  * handles without a global sort.
  */
object SimilarityOps {

  /** array<float> → array<long>, elementwise round(x·1000). */
  def quantize(vec: Column): Column =
    transform(vec, e => round(e.cast("double") * 1000).cast("long"))

  /** Exact int64 dot product of two equal-length long arrays — a
    * native codegen'd expression ([[graft.functions.DotProductQ]]);
    * the built-in `aggregate(zip_with(...))` twin remains as
    * [[dotQBuiltins]] (property-tested equal).
    */
  def dotQ(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.DotProductQ(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Pure-built-ins dot product (interpreted higher-order tree) —
    * kept as the reference semantics for [[dotQ]]'s tests.
    */
  def dotQBuiltins(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine from exact integer dot/norms: one division + one sqrt on
    * exact int64 inputs (< 2^53, so the int→double casts are exact).
    */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt((na * nb).cast("double"))

  private def quantized(df: DataFrame, idCol: String, vecCol: String,
                        extra: Seq[String] = Nil): DataFrame =
    df.select((Seq(col(idCol)) ++ extra.map(col) :+ quantize(col(vecCol)).as("qv")): _*)
      .withColumn("nsq", normSqQ(col("qv")))

  /** Brute-force cosine top-k: for each row of `queries`, the k
    * nearest `candidates` by cosine (desc), ties broken by candidate
    * id (asc); self-pairs excluded when ids collide.
    * Output: (query_id, neighbor_id, rank, cos_milli6) where
    * cos_milli6 = floor(cosine·10^6) — exact integer output.
    */
  def annBruteForce(queries: DataFrame, candidates: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = quantized(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("qv").as("q_qv"), col("nsq").as("q_nsq"))
    val c = quantized(candidates, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qv").as("c_qv"), col("nsq").as("c_nsq"))
    topK(c.crossJoin(broadcast(q)), k)
  }

  /** IVF-style ANN: candidates are restricted to the query's bucket
    * (a precomputed cluster label). Kept for label-partitioned
    * corpora; [[annIvfCentroids]] is the real-IVF path that computes
    * its own coarse quantizer.
    */
  def annIvf(queries: DataFrame, candidates: DataFrame,
             idCol: String, vecCol: String, bucketCol: String, k: Int): DataFrame = {
    val q = quantized(queries, idCol, vecCol, Seq(bucketCol))
      .select(col(idCol).as("query_id"), col(bucketCol).as("__bkt"),
        col("qv").as("q_qv"), col("nsq").as("q_nsq"))
    val c = quantized(candidates, idCol, vecCol, Seq(bucketCol))
      .select(col(idCol).as("neighbor_id"), col(bucketCol).as("__bkt"),
        col("qv").as("c_qv"), col("nsq").as("c_nsq"))
    topK(c.join(broadcast(q), Seq("__bkt")), k)
  }

  /** IVF with a REAL coarse quantizer: `numCentroids` seed centroids
    * drawn as a deterministic HASH SAMPLE (the vectors with the
    * smallest md5(id) — uniform over the corpus, engine-portable),
    * refined by `lloydSteps` k-means (Lloyd) iterations whose
    * centroids are EXACT integer means (floor(sum_i / count), int64 —
    * bit-identical in any engine), then every candidate assigned to
    * its nearest refined centroid by cosine (deterministic
    * centroid-id tie-break), queries probing their `nprobe` nearest
    * cells.
    *
    * Plan shape at scale: seed selection is a TakeOrderedAndProject
    * (per-partition top-K heaps, no full sort); each Lloyd step is a
    * NARROW broadcast argmax over the big side followed by ONE
    * groupBy(cell) whose `dims` sum aggregates combine map-side down
    * to K rows; the search is an equi-join on cell id with the
    * nprobe-expanded query set broadcast. A candidate lives in
    * exactly one cell, so probe results need no pair dedup.
    */
  def annIvfCentroids(queries: DataFrame, candidates: DataFrame,
                      idCol: String, vecCol: String, k: Int,
                      numCentroids: Int, nprobe: Int,
                      dims: Int = 64, lloydSteps: Int = 1): DataFrame = {
    // Centroids ride as ONE broadcast row holding an array —
    // assignment is then a per-row argmax over that array: a NARROW
    // map over the big side (no shuffle, no window; a row_number
    // formulation would re-shuffle every vector just to rank K=8
    // centroids).
    def centArrOf(cents: DataFrame): DataFrame =
      cents.agg(collect_list(struct(col("cid"), col("cent_qv"),
        col("cent_nsq"))).as("__cents"))
    def assignCells(df: DataFrame, probes: Int, centArr: DataFrame): DataFrame = {
      val scored = transform(col("__cents"), c => struct(
        cosineQ(dotQ(col("qv"), c.getField("cent_qv")), col("nsq"),
          c.getField("cent_nsq")).as("cos"),
        c.getField("cid").as("cid")))
      val byCosDescCidAsc = (l: Column, r: Column) =>
        when(l.getField("cos") > r.getField("cos"), -1)
          .when(l.getField("cos") < r.getField("cos"), 1)
          .when(l.getField("cid") < r.getField("cid"), -1)
          .when(l.getField("cid") > r.getField("cid"), 1)
          .otherwise(0)
      quantized(df, idCol, vecCol)
        .crossJoin(broadcast(centArr))
        .withColumn("__probe", explode(slice(array_sort(scored, byCosDescCidAsc),
          1, probes)))
        .select(col(idCol), col("__probe.cid").as("cell"), col("qv"), col("nsq"))
    }
    val seeds = quantized(candidates, idCol, vecCol)
      .withColumn("__h", md5(col(idCol).cast("string")))
      .orderBy(col("__h"), col(idCol))
      .limit(numCentroids)
      .select(col(idCol).cast("long").as("cid"), col("qv").as("cent_qv"),
        col("nsq").as("cent_nsq"))
    var centArr = centArrOf(seeds)
    (0 until lloydSteps).foreach { _ =>
      val member = assignCells(candidates, 1, centArr)
      val sumCols = (0 until dims).map(i => sum(get(col("qv"), lit(i))).as(s"s$i")) :+
        count(lit(1)).as("cnt")
      val refined = member.groupBy(col("cell"))
        .agg(sumCols.head, sumCols.tail: _*)
        .select(col("cell").as("cid"),
          array((0 until dims).map(i =>
            floor(col(s"s$i").cast("double") / col("cnt"))): _*).as("cent_qv"))
        .withColumn("cent_nsq", normSqQ(col("cent_qv")))
      centArr = centArrOf(refined)
    }
    val idx = assignCells(candidates, 1, centArr)
      .select(col(idCol).as("neighbor_id"), col("cell"),
        col("qv").as("c_qv"), col("nsq").as("c_nsq"))
    val qs = assignCells(queries, nprobe, centArr)
      .select(col(idCol).as("query_id"), col("cell"),
        col("qv").as("q_qv"), col("nsq").as("q_nsq"))
    topK(idx.join(broadcast(qs), Seq("cell")), k)
  }

  private def topK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dotQ(col("q_qv"), col("c_qv")))
      .withColumn("cos", cosineQ(col("dot"), col("q_nsq"), col("c_nsq")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_micro"))
  }

  /** Random-hyperplane LSH near-dup pairs — the LABEL-FREE scale path
    * for embedding dedup ([[embeddingNearDupPairs]] needs a bucket
    * column; this one builds its own blocking): each vector gets a
    * `planes`-bit signature (bit p = sign of ⟨qv, h_p⟩ against a
    * DETERMINISTIC ±1 hyperplane h_p whose component (p, i) is drawn
    * from md5("hp:p:i") — engine-portable, so the DuckDB oracle
    * derives identical planes), the signature is cut into `bands`
    * blocking keys, and candidates sharing ANY band are verified with
    * the EXACT integer cosine threshold (den²·dot² ≥ num²·na·nb ∧
    * dot > 0). Output: (id_a, id_b, cos_micro), id_a < id_b.
    *
    * Semantics are the LSH contract: a reported pair always truly
    * passes the threshold (the verify is exact); a qualifying pair is
    * found iff it shares a band — for cos ≥ 0.8 and 4×4-bit bands
    * that is ~0.87 per pair and rises steeply with similarity
    * (recall measured in OpsSpec). Scale shape: signature build is a
    * NARROW map (the hyperplanes are plan-time literals riding the
    * codegen'd dot product), blocking keys number bands·2^(planes/
    * bands), and the candidate join is a bucketed equi-join — no
    * all-pairs stage anywhere.
    */
  def embeddingLshPairs(df: DataFrame, idCol: String, vecCol: String,
                        num: Long, den: Long,
                        planes: Int = 16, bands: Int = 4,
                        dims: Int = 64): DataFrame =
    embeddingLshPairsImpl(df, idCol, vecCol, num, den, planes, bands, dims,
      dedupFirst = false)

  /** `dedupFirst = true` is the MEASURED-AND-REJECTED r4 shape (pair
    * dedup before the exact verify, both quantized vectors carried
    * through the distinct exchange) — kept only for bench/LshABProbe's
    * exchange-bytes A/B; production path is verify-first.
    */
  private[graft] def embeddingLshPairsImpl(df: DataFrame, idCol: String, vecCol: String,
                                           num: Long, den: Long,
                                           planes: Int, bands: Int, dims: Int,
                                           dedupFirst: Boolean): DataFrame = {
    require(planes % bands == 0, s"planes ($planes) must split into bands ($bands)")
    require(planes <= 62, "signature must fit a non-negative long")
    val rowsPerBand = planes / bands
    // ±1 hyperplane components from the FIRST md5 hex char's parity —
    // restated verbatim in the oracle SQL
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
    def sign(p: Int, i: Int): Long =
      if (md5hex(s"hp:$p:$i").charAt(0).toInt % 2 == 0) 1L else -1L
    val planeLits: Seq[Column] =
      (0 until planes).map(p => typedLit((0 until dims).map(i => sign(p, i))))
    val qd = quantized(df, idCol, vecCol)
    val sig = (0 until planes).map(p =>
      when(dotQ(col("qv"), planeLits(p)) > 0, lit(1L << p)).otherwise(0L)).reduce(_ + _)
    val banded = qd.withColumn("sig", sig)
      .select(col(idCol), col("qv"), col("nsq"), col("sig"),
        explode(array((0 until bands).map(lit): _*)).as("band"))
      .withColumn("bv",
        expr(s"shiftright(sig, band * $rowsPerBand)")
          .bitwiseAND(lit((1L << rowsPerBand) - 1)))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bv"),
      col("qv").as("a_qv"), col("nsq").as("a_nsq"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bv"),
      col("qv").as("b_qv"), col("nsq").as("b_nsq"))
    // VERIFY BEFORE THE PAIR-DEDUP: the exact cosine check is per-row
    // and codegen'd, so running it on each banded candidate (a pair
    // sharing k bands is verified k times, k ≤ bands) costs only
    // duplicate dot products, while the distinct exchange then carries
    // (id_a, id_b, cos_micro) — 3 scalars — instead of both 64-long
    // quantized vectors per candidate (VERDICT r4 #5; A/B numbers in
    // bench/LshABProbe's header).
    val cand = a.join(b, Seq("band", "bv"))
      .where(col("id_a") < col("id_b"))
    if (dedupFirst)
      cand.select("id_a", "id_b", "a_qv", "a_nsq", "b_qv", "b_nsq")
        .distinct()
        .withColumn("dot", dotQ(col("a_qv"), col("b_qv")))
        .where(col("dot") > 0 &&
          col("dot") * col("dot") * (den * den) >= col("a_nsq") * col("b_nsq") * (num * num))
        .select(col("id_a"), col("id_b"),
          floor(cosineQ(col("dot"), col("a_nsq"), col("b_nsq")) * 1e6).cast("long").as("cos_micro"))
    else
      cand.withColumn("dot", dotQ(col("a_qv"), col("b_qv")))
        .where(col("dot") > 0 &&
          col("dot") * col("dot") * (den * den) >= col("a_nsq") * col("b_nsq") * (num * num))
        .select(col("id_a"), col("id_b"),
          floor(cosineQ(col("dot"), col("a_nsq"), col("b_nsq")) * 1e6).cast("long").as("cos_micro"))
        .distinct() // a pair can share several bands — emit once
  }

  /** Embedding-cosine near-duplicate pairs: cosine ≥ num/den, decided
    * in EXACT integer arithmetic (den²·dot² ≥ num²·na·nb ∧ dot > 0),
    * blocked by `bucketCol` (cluster label ≙ IVF cell) so the pair
    * join is an equi-join, not a cross join.
    * Output: (id_a, id_b, cos_micro), id_a < id_b.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            bucketCol: String, num: Long, den: Long): DataFrame = {
    val qd = quantized(df, idCol, vecCol, Seq(bucketCol))
    val a = qd.select(col(idCol).as("id_a"), col(bucketCol).as("__bkt"),
      col("qv").as("a_qv"), col("nsq").as("a_nsq"))
    val b = qd.select(col(idCol).as("id_b"), col(bucketCol).as("__bkt"),
      col("qv").as("b_qv"), col("nsq").as("b_nsq"))
    a.join(b, Seq("__bkt"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dot", dotQ(col("a_qv"), col("b_qv")))
      .where(col("dot") > 0 &&
        col("dot") * col("dot") * (den * den) >= col("a_nsq") * col("b_nsq") * (num * num))
      .select(col("id_a"), col("id_b"),
        floor(cosineQ(col("dot"), col("a_nsq"), col("b_nsq")) * 1e6).cast("long").as("cos_micro"))
  }
}
