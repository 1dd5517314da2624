package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data curation: exact,
  * character-n-gram Jaccard, MinHash+LSH, and SimHash. Embedding
  * cosine near-dup lives in [[SimilarityOps]].
  *
  * Engine-portability: all hashing is md5-based (identical in Spark
  * and DuckDB) so the DuckDB oracle can replicate bit-for-bit; all
  * similarity thresholds are compared in exact integer arithmetic
  * (cross-multiplication), never via floating division.
  *
  * Scale notes: shingling is a narrow flatMap; candidate generation
  * shuffles on (shingle) or (band, signature) — bounded keys, and the
  * pair join is an equi-join Catalyst plans as a shuffled hash join.
  * At 100 TB the shingle join gets a frequency cap (drop shingles in
  * > maxDf docs — stopword shingles generate quadratic candidates and
  * carry no signal), which is also what keeps the skew bounded.
  */
object DedupOps {

  /** Exact dedup: group by md5(text), keep the minimum id — the one
    * deterministic representative per duplicate class. Map-side
    * partial agg makes this one shuffle of (hash → min/count).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct WORD n-gram shingles per doc: (id, shingle).
    *
    * Word shingles, not character shingles, deliberately: character
    * 3-grams over natural text have a tiny distinct domain with huge
    * document frequency, so the candidate self-join explodes
    * quadratically (measured on the sf0.1 corpus: 377 distinct char
    * shingles → 2.2e9 join rows, vs 27k word shingles → 2.8e6).
    * Stopword-shingle frequency capping (maxDf) is the second guard.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shinglesRaw(docs, idCol, textCol, n).distinct()

  /** Shingles WITHOUT the distinct — min-style consumers (minhash)
    * are insensitive to duplicates, so they skip the dedup exchange
    * entirely and feed the narrow flatMap straight into their own
    * aggregation (one shuffle instead of two).
    */
  private def shinglesRaw(docs: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= n)
      .select(col(idCol), explode(sequence(lit(1), size(col("__t")) - (n - 1))).as("pos"),
        col("__t"))
      .select(col(idCol), array_join(slice(col("__t"), col("pos"), lit(n)), " ").as("shingle"))

  /** n-gram Jaccard near-dup pairs with similarity ≥ num/den
    * (exact rational compare: den·|A∩B| ≥ num·(|A|+|B|−|A∩B|)).
    * Returns (id_a, id_b, shared, size_a, size_b) with id_a < id_b.
    *
    * maxDf: shingles present in more than maxDf docs are dropped
    * from candidate generation (quadratic-blowup guard at scale);
    * pass 0 to disable. NOTE: with a cap this is approximate —
    * the final Jaccard is still computed on capped shingle sets, so
    * the oracle must apply the identical cap.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, num: Int, den: Int, maxDf: Long = 0L): DataFrame = {
    // ONE shingle lineage: the df-cap and the per-doc set size ride
    // along as WINDOW columns instead of separate groupBy branches.
    // A/B-measured against two "more scalable looking" rewrites at
    // local[32] sf0.1 (cold/warm secs, fresh JVM):
    //   windows (this)                               14.8 / 2.1
    //   broadcast-anti heavy-hitter cap + size window 17.5 / 3.6
    //   groupBy cap + groupBy sizes joined back       39.4 / 4.3
    // The agg+join shapes pay a blocking broadcast build plus an extra
    // full shuffle of the shingle set on id; windows pipeline per
    // partition off the shared exchange. At the 100 TB point the
    // dominant cost is the candidate self-join either way, and the
    // window sorts are Spark's external (spilling) sort — so the
    // measured winner is also scale-safe.
    import org.apache.spark.sql.expressions.Window
    val sh0 = shingles(docs, idCol, textCol, n)
    val capped =
      if (maxDf <= 0) sh0
      else sh0
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("shingle")))
        .where(col("__df") <= maxDf)
        .drop("__df")
    val sh = capped
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(idCol)))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"), col("__sz").as("size_a"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"), col("__sz").as("size_b"))
    a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"),
        first("size_a").as("size_a"), first("size_b").as("size_b"))
      .where(col("shared") * den >= (col("size_a") + col("size_b") - col("shared")) * num)
      .select("id_a", "id_b", "shared", "size_a", "size_b")
  }

  /** MinHash signatures: for each of `bands`×`rows` hash functions
    * h_i(s) = md5(i ‖ ':' ‖ s), the signature is the min hash over
    * the doc's shingles. Returns (id, band, sig) where sig is the
    * concatenation of the band's `rows` min-hashes.
    *
    * Plan shape: ONE groupBy(id) with bands×rows min() aggregates
    * directly over the shingle rows — no hash-index explode (which
    * would multiply the shuffle by bands×rows) and map-side partial
    * aggregation reduces each partition to one row per doc before the
    * exchange. The per-band signature string is then a pure
    * projection; bands are unpivoted with one small explode over
    * `bands` elements per doc row.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, bands: Int, rows: Int): DataFrame = {
    val sh = shinglesRaw(docs, idCol, textCol, n) // min() ignores dups: no distinct exchange
    // Hash family: 8-hex-char (32-bit) slices of md5(group ':' shingle),
    // 4 slices per digest — only ceil(bands*rows/4) md5 evaluations per
    // shingle row instead of one per hash function (the md5 calls
    // dominate signature cost; codegen subexpression elimination
    // shares each digest across its 4 min() aggregates). 32-bit
    // minhash values collide at ~1/2^32 — immaterial against the
    // per-doc shingle counts this blocks on.
    val minCols = (0 until bands * rows).map { h =>
      val digest = md5(concat(lit(s"${h / 4}:"), col("shingle")))
      min(substring(digest, (h % 4) * 8 + 1, 8)).as(s"mh$h")
    }
    val sigs = sh.groupBy(col(idCol)).agg(minCols.head, minCols.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      val entries = (b * rows until (b + 1) * rows).map(h =>
        concat_ws("=", lit(h), col(s"mh$h")))
      struct(lit(b).as("band"),
        concat_ws("|", sort_array(array(entries: _*))).as("sig"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash+LSH candidate pairs: docs sharing any full band
    * signature. Returns distinct (id_a, id_b), id_a < id_b.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 4, rows: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, n, bands, rows)
    val a = sigs.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = sigs.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Connected components over a near-dup pair graph: every id gets
    * `cluster_rep` = the minimum id reachable through the pairs — the
    * deterministic cluster representative. A training-data dedup
    * keeps exactly the rows with `id == cluster_rep` (one survivor
    * per duplicate class), which is the step that turns PAIR output
    * (jaccard / LSH / simhash / cosine) into droppable rows.
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each
    * round every node takes the min label over itself and its
    * neighbors, then follows its label's label (path halving), so
    * convergence is O(log n) rounds even on long chains (plain
    * propagation is O(diameter)). Each round is two equi-joins + one
    * partial-aggregated groupBy on the label key — all
    * shuffle-partitioned, nothing driver-side except the fixpoint
    * check (one count per round, monotone: labels only decrease).
    *
    * Each round's result is `localCheckpoint`ed: the jump self-join
    * embeds the previous round's LOGICAL PLAN twice, so without
    * truncation the plan tree doubles every round and Catalyst
    * analysis alone goes exponential (measured: a 60-node graph ran
    * the driver at 2^rounds plan nodes and 20 GB of heap). On a real
    * cluster a reliable `checkpoint` dir is the hardened variant
    * (localCheckpoint state dies with an executor).
    * Returns (idCol, cluster_rep).
    */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
                          aCol: String, bCol: String,
                          maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ids.select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: min over self + neighbors. Both union children end
      // in fresh Alias projections — after a localCheckpoint the raw
      // `labels` attributes would appear in BOTH children and break
      // the union's constraint rewriting (key-not-found in analysis).
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("label").as("label"))
        .unionByName(labels.select(col("id").as("id"), col("label").as("label")))
        .groupBy("id").agg(min("label").as("label"))
      // pointer jump: label := label(label) (path halving)
      val next0 = prop.as("x")
        .join(prop.select(col("id").as("lid"), col("label").as("llabel")),
          col("x.label") === col("lid"), "left")
        .select(col("x.id").as("id"),
          coalesce(col("llabel"), col("x.label")).as("label"))
      // truncate the doubling plan (see doc): RDD round-trip gives a
      // fresh LogicalRDD with brand-new attribute ids
      val next = ids.sparkSession.createDataFrame(next0.rdd, next0.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.as("n")
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .where(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as(idCol), col("label").as("cluster_rep"))
  }

  /** 32-bit SimHash over word tokens. Bit j of the fingerprint is the
    * sign of Σ_tokens (2·parity_j(token) − 1), where parity_j(token)
    * = ascii(md5(token)[j]) mod 2 — one deterministic hash bit per
    * hex char, identical in any engine with md5/ascii/substring.
    * Returns (id, simhash: long).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE groupBy(id) with 32 sum() aggregates over the token rows —
    // no 32× bit-index explode; map-side combine collapses each
    // partition to one row per doc before the exchange.
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val sumCols = (0 until 32).map(j =>
      sum(ascii(substring(col("h"), j + 1, 1)) % 2 * 2 - 1).as(s"s$j"))
    val fp = (0 until 32).map(j =>
      when(col(s"s$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming`, blocked on 4 byte
    * bands (a pair within distance ≤ 3 of 32 bits must agree on at
    * least one of 4 bytes — pigeonhole), verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = simhash(docs, idCol, textCol)
    val banded = fp.select(col(idCol), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("byte_i"))
      .withColumn("byte_v", expr("shiftright(simhash, byte_i * 8)") % 256)
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("byte_i"), col("byte_v"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("byte_i"), col("byte_v"))
    a.join(b, Seq("byte_i", "byte_v"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
