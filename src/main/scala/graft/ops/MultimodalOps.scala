package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded executor-side in batches.
  *
  * The actual codec is STUBBED (this container has no image/audio
  * libraries): `decodeBatch` derives metadata deterministically from
  * the payload bytes. Everything around it is the real thing — the
  * binary column, the typed row shape, the mapPartitions batch loop
  * (the Scala analog of a pandas-batched `mapInPandas` decode), and
  * the partition-parallel execution — so swapping in a real decoder
  * is a one-function change.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, media_ref: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, media_ref: String, width: Long, height: Long,
                       n_frames: Long, modality: String)

  /** Batch size for the stub decoder — the shape a vectorized codec
    * (or an Arrow-batched pandas UDF) would consume.
    */
  val DecodeBatchSize = 64

  /** Derive an opaque media payload per even-id document: at ingest
    * the payload would be fetched bytes; here it is unhex(md5(ref)) —
    * 16 deterministic bytes standing in for a real blob.
    */
  def deriveMedia(docs: DataFrame): DataFrame =
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        concat(lit("media://img/"), md5(col("text"))).as("media_ref"))
      .withColumn("payload", unhex(md5(col("media_ref"))))

  /** Decode: binary payload → typed metadata, batched per partition.
    * STUB decode — nibbles of the first payload bytes stand in for a
    * real header parse.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(decodeBatch)
    }.toDF()
  }

  /** One "vectorized" decode call. Real system: hand `batch` to the
    * codec as one contiguous buffer; here: deterministic fake.
    */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaMeta] = batch.map { r =>
    val b0 = r.payload(0) & 0xff
    val b1 = r.payload(1) & 0xff
    val h1 = (b0 >> 4) & 0xf; val h2 = b0 & 0xf
    val h3 = (b1 >> 4) & 0xf; val h4 = b1 & 0xf
    val modality = (h4 % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    MediaMeta(r.doc_id, r.media_ref, 16L * (1 + h1), 16L * (1 + h2), 1L + h3, modality)
  }

  // ---- frame-sample / resize / feature-extract -----------------------

  case class FrameRow(doc_id: Long, media_ref: String, frame_idx: Long,
                      frame_hex: String, resized_w: Long, resized_h: Long,
                      feat_sum: Long)

  /** Frame sampling + integer resize + a toy feature per frame, in
    * the same batched mapPartitions shape as [[decodeMeta]]. The
    * payload's 16 bytes stand in for the media container: every 2-byte
    * slice is a "frame" (wrapping), the decode yields n_frames of
    * them, every `everyK`-th is kept; (width, height) resize to fit
    * `maxDim` with integer math; the feature is the frame's nibble
    * sum (stub for an embedding/codec feature call). All of it is a
    * NARROW partition-local pass — the real codec swap point is
    * [[frameBatch]], everything around it (binary column, batch loop,
    * typed output rows, partition parallelism) is the real plumbing.
    */
  def sampleFrames(media: DataFrame, everyK: Int = 2, maxDim: Long = 64L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(b => frameBatch(b, everyK, maxDim))
    }.toDF()
  }

  /** One "vectorized" frame-decode call over a batch. */
  def frameBatch(batch: Seq[MediaRow], everyK: Int, maxDim: Long): Seq[FrameRow] =
    batch.flatMap { r =>
      val meta = decodeBatch(Seq(r)).head
      val hex = r.payload.map(b => f"${b & 0xff}%02x").mkString // 32 hex chars
      val longest = math.max(meta.width, meta.height)
      val (rw, rh) =
        if (longest <= maxDim) (meta.width, meta.height)
        else (meta.width * maxDim / longest, meta.height * maxDim / longest)
      (0L until meta.n_frames by everyK.toLong).map { f =>
        val p = ((f * 4) % 32).toInt
        val frameHex = hex.substring(p, p + 4)
        val featSum = frameHex.map(c => java.lang.Character.digit(c, 16).toLong).sum
        FrameRow(r.doc_id, r.media_ref, f, frameHex, rw, rh, featSum)
      }
    }

  private def nib(expr: String) =
    s"(CASE WHEN ascii($expr) BETWEEN 48 AND 57 THEN ascii($expr) - 48 ELSE ascii($expr) - 87 END)"

  /** DuckDB restatement of deriveMedia + the stub decode (hex-char
    * nibble arithmetic instead of byte access; payload = unhex(m2),
    * so the payload hex IS m2).
    */
  val oracleSql: String = {
    def hv(i: Int) = nib(s"substr(m2,$i,1)")
    s"""WITH media AS (
      | SELECT doc_id, concat('media://img/', md5(text)) AS media_ref FROM documents WHERE doc_id % 2 = 0),
      |meta AS (SELECT doc_id, media_ref, md5(media_ref) AS m2 FROM media)
      |SELECT doc_id, media_ref,
      | CAST(16 * (1 + ${hv(1)}) AS BIGINT) AS width,
      | CAST(16 * (1 + ${hv(2)}) AS BIGINT) AS height,
      | CAST(1 + ${hv(3)} AS BIGINT) AS n_frames,
      | CASE ${hv(4)} % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality
      |FROM meta""".stripMargin
  }

  /** DuckDB restatement of deriveMedia + sampleFrames(everyK=2,
    * maxDim=64).
    */
  val frameOracleSql: String = {
    def hv(i: Int) = nib(s"substr(m2,$i,1)")
    def fnib(j: Int) = nib(s"substr(m2, (f*4)%32 + $j, 1)")
    s"""WITH media AS (
      | SELECT doc_id, concat('media://img/', md5(text)) AS media_ref FROM documents WHERE doc_id % 2 = 0),
      |meta AS (SELECT doc_id, media_ref, md5(media_ref) AS m2 FROM media),
      |dims AS (
      | SELECT doc_id, media_ref, m2,
      |  16 * (1 + ${hv(1)}) AS w, 16 * (1 + ${hv(2)}) AS h, 1 + ${hv(3)} AS nf
      | FROM meta),
      |rs AS (
      | SELECT *,
      |  CASE WHEN greatest(w, h) <= 64 THEN w ELSE w * 64 // greatest(w, h) END AS rw,
      |  CASE WHEN greatest(w, h) <= 64 THEN h ELSE h * 64 // greatest(w, h) END AS rh
      | FROM dims),
      |fr AS (SELECT *, unnest(generate_series(0, nf - 1)) AS f FROM rs)
      |SELECT doc_id, media_ref, CAST(f AS BIGINT) AS frame_idx,
      | substr(m2, (f*4)%32 + 1, 4) AS frame_hex,
      | CAST(rw AS BIGINT) AS resized_w, CAST(rh AS BIGINT) AS resized_h,
      | CAST(${fnib(1)} + ${fnib(2)} + ${fnib(3)} + ${fnib(4)} AS BIGINT) AS feat_sum
      |FROM fr WHERE f % 2 = 0""".stripMargin
  }
}
