package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column operators: image/audio/video handled as opaque
  * `binary` payloads plus typed metadata, the way a training-data
  * pipeline carries them at 100 TB (never decode-then-shuffle; decode
  * late, after filters prune, so only surviving bytes cross the wire).
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * STUB: `fakeDecode` derives deterministic pseudo-features from the
  * payload's md5 (documented below) where a real decoder (ImageIO / JNI
  * ffmpeg) would parse bytes. Everything around it — binary schema,
  * mapPartitions batch shape, partition-local decoder reuse, metadata
  * typing, sampling — is the real Spark plumbing, and the fake math is
  * mirrored in DuckDB SQL so even the stub is oracle-checked.
  *
  * Payloads are synthesized as the document text's UTF-8 bytes (the
  * testdata ships no binary column); the pipeline treats them as opaque.
  */
object Multimodal {

  /** documents → opaque binary payload + typed metadata. */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("source"),
      when(col("source") === "web", "image/jpeg")
        .when(col("source") === "books", "video/mp4")
        .when(col("source") === "wiki", "image/png")
        .otherwise("audio/wav").as("mime"))

  /** Metadata extraction: byte length + content digest per payload. */
  def mmMetadata(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir).select(
      col("doc_id"), col("mime"),
      length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("digest"))

  val mmMetadataSql: String =
    """SELECT doc_id,
      |  CASE WHEN source = 'web' THEN 'image/jpeg'
      |       WHEN source = 'books' THEN 'video/mp4'
      |       WHEN source = 'wiki' THEN 'image/png'
      |       ELSE 'audio/wav' END AS mime,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS digest
      |FROM documents""".stripMargin

  // ---- stubbed decode ------------------------------------------------------

  /** Feature fields are Options: a NULL payload (NULL text) decodes to
    * NULL features — the oracle's md5(NULL) propagates to NULL columns,
    * and a bare Long field would instead NPE the task on digest(null). */
  case class DecodedFrame(doc_id: Long, width: Option[Long], height: Option[Long],
      channels: Option[Long], mean_intensity: Option[Double])

  /** STUB decoder: a real implementation would parse the image header /
    * pixel data here. The fake derives four 16-bit values from the hex
    * md5 of the payload (nibbles 1-4, 5-8, 9-12, 13-16) — deterministic,
    * payload-dependent, and expressible in the SQL oracle. The digest
    * instance is the partition-scoped decoder handle passed in by
    * [[mmDecode]] (MessageDigest resets after digest(), so one instance
    * serves every row of the partition).
    */
  private def fakeDecode(md: MessageDigest, docId: Long,
      payload: Array[Byte]): DecodedFrame = {
    if (payload == null)
      return DecodedFrame(docId, None, None, None, None)
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def nib(i: Int): Long = java.lang.Long.parseLong(hex.substring(i, i + 1), 16)
    def val16(i: Int): Long =
      nib(i) * 4096 + nib(i + 1) * 256 + nib(i + 2) * 16 + nib(i + 3)
    DecodedFrame(
      doc_id = docId,
      width = Some(64 + val16(0) % 960),
      height = Some(64 + val16(4) % 960),
      channels = Some(1 + val16(8) % 4),
      mean_intensity = Some((val16(12) % 256).toDouble))
  }

  /** Decode via mapPartitions: one decoder instance per partition (real
    * codecs are expensive to construct), batch-iterating rows without
    * materializing the partition. This is the plumbing a real decoder
    * drops into unchanged.
    */
  def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // the decoder init — ONCE per partition, reused across rows
        val md = MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) => fakeDecode(md, id, bytes) }
      }
      .toDF()
  }

  /** The stub decoder's md5-nibble math, mirrored in DuckDB. */
  private val NibSql =
    "(strpos('0123456789abcdef', substr(h, %d, 1)) - 1)"
  private def val16Sql(i: Int): String =
    s"(${NibSql.format(i)} * 4096 + ${NibSql.format(i + 1)} * 256 + " +
      s"${NibSql.format(i + 2)} * 16 + ${NibSql.format(i + 3)})"

  val mmDecodeSql: String =
    s"""WITH h AS (SELECT doc_id, md5(text) AS h FROM documents)
      |SELECT doc_id,
      |  CAST(64 + ${val16Sql(1)} % 960 AS BIGINT) AS width,
      |  CAST(64 + ${val16Sql(5)} % 960 AS BIGINT) AS height,
      |  CAST(1 + ${val16Sql(9)} % 4 AS BIGINT) AS channels,
      |  CAST(${val16Sql(13)} % 256 AS DOUBLE) AS mean_intensity
      |FROM h""".stripMargin

  // ---- resize plumbing -----------------------------------------------------

  /** Resize planning: fit each decoded frame into 224×224 preserving
    * aspect ratio. Pure arithmetic on the decoded dims — the actual
    * pixel resample is part of the stubbed decode stage.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    mmDecode(spark, dir)
      // scale computed ONCE, out_w/out_h derived from it — a fit-rule
      // change is one edit here (plus the SQL mirror), not three
      .select(col("doc_id"), col("width"), col("height"),
        (lit(224.0) / greatest(col("width"), col("height"))).as("scale"))
      .select(col("doc_id"), col("width"), col("height"), col("scale"),
        floor(col("width") * col("scale")).cast("long").as("out_w"),
        floor(col("height") * col("scale")).cast("long").as("out_h"))

  val mmResizeSql: String =
    s"""WITH d AS ($mmDecodeSql)
      |SELECT doc_id, width, height,
      |  224.0 / greatest(width, height) AS scale,
      |  CAST(floor(width * (224.0 / greatest(width, height))) AS BIGINT) AS out_w,
      |  CAST(floor(height * (224.0 / greatest(width, height))) AS BIGINT) AS out_h
      |FROM d""".stripMargin

  // ---- frame sampling ------------------------------------------------------

  /** Video frame sampling: pretend each payload is a clip with
    * byte_len/20 + 1 frames; emit every 5th frame index (the shape of
    * a keyframe-extraction stage — explode stays lazy, no driver loop).
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .select(col("doc_id"),
        // `div`: integer floor division on both engines (Column `/` is
        // IEEE double division)
        expr("(length(payload) div 20) + 1").as("n_frames"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))).as("frame_idx"))

  val mmFrameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(octet_length(encode(text)) // 20 + 1 AS BIGINT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
      |FROM f""".stripMargin

  // ---- registry ------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_metadata" -> (mmMetadata _),
    "mm_decode" -> (mmDecode _),
    "mm_resize" -> (mmResize _),
    "mm_frame_sample" -> (mmFrameSample _))

  val oracles: Map[String, String] = Map(
    "mm_metadata" -> mmMetadataSql,
    "mm_decode" -> mmDecodeSql,
    "mm_resize" -> mmResizeSql,
    "mm_frame_sample" -> mmFrameSampleSql)
}
