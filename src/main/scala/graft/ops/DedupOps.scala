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

  /** Distinct character n-gram shingles per doc: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), col(textCol).as("__t"))
      .where(length(col("__t")) >= n)
      .select(col(idCol), explode(sequence(lit(1), length(col("__t")) - (n - 1))).as("pos"),
        col("__t"))
      .select(col(idCol), expr(s"substring(__t, pos, $n)").as("shingle"))
      .distinct()

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
    val sh0 = shingles(docs, idCol, textCol, n)
    val sh =
      if (maxDf <= 0) sh0
      else {
        val keep = sh0.groupBy("shingle").agg(count(lit(1)).as("__df"))
          .where(col("__df") <= maxDf).select("shingle")
        sh0.join(keep, "shingle")
      }
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), col("shingle"))
    val b = sh.select(col(idCol).as("id_b"), col("shingle"))
    val shared = a.join(b, "shingle")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("size_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("size_b")), "id_b")
      .where(col("shared") * den >= (col("size_a") + col("size_b") - col("shared")) * num)
      .select("id_a", "id_b", "shared", "size_a", "size_b")
  }

  /** MinHash signatures: for each of `bands`×`rows` hash functions
    * h_i(s) = md5(i ‖ ':' ‖ s), the signature is the min hash over
    * the doc's shingles. Returns (id, band, sig) where sig is the
    * concatenation of the band's `rows` min-hashes.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, bands: Int, rows: Int): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    val hashed = sh
      .select(col(idCol), explode(sequence(lit(0), lit(bands * rows - 1))).as("h"),
        col("shingle"))
      .select(col(idCol), col("h"),
        md5(concat(col("h").cast("string"), lit(":"), col("shingle"))).as("hv"))
    hashed.groupBy(col(idCol), col("h")).agg(min("hv").as("mh"))
      // integer division (DuckDB CAST(x/4 AS INT) would ROUND —
      // keep both engines on explicit floor division)
      .withColumn("band", floor(col("h") / rows).cast("int"))
      .groupBy(col(idCol), col("band"))
      // deterministic order inside the band signature:
      .agg(concat_ws("|", sort_array(collect_list(concat_ws("=", col("h"), col("mh"))))).as("sig"))
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

  /** 32-bit SimHash over word tokens. Bit j of the fingerprint is the
    * sign of Σ_tokens (2·parity_j(token) − 1), where parity_j(token)
    * = ascii(md5(token)[j]) mod 2 — one deterministic hash bit per
    * hex char, identical in any engine with md5/ascii/substring.
    * Returns (id, simhash: long).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bits = toks
      .select(col(idCol), explode(sequence(lit(0), lit(31))).as("j"), col("h"))
      .select(col(idCol), col("j"),
        (ascii(expr("substring(h, j + 1, 1)")) % 2 * 2 - 1).as("contrib"))
      .groupBy(col(idCol), col("j"))
      .agg(sum("contrib").as("s"))
      .withColumn("bit", when(col("s") > 0, 1L).otherwise(0L))
    bits.groupBy(col(idCol))
      .agg(sum(col("bit") * expr("shiftleft(CAST(1 AS BIGINT), j)")).as("simhash"))
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
