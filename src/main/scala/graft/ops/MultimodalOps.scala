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

  /** DuckDB restatement of deriveMedia + the stub decode (hex-char
    * nibble arithmetic instead of byte access).
    */
  val oracleSql: String = {
    def hv(i: Int) =
      s"(CASE WHEN ascii(substr(m2,$i,1)) BETWEEN 48 AND 57 THEN ascii(substr(m2,$i,1)) - 48 ELSE ascii(substr(m2,$i,1)) - 87 END)"
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
}
