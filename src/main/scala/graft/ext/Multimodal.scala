package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata structs, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake metadata from the
  * payload's md5. Everything AROUND the stub — schema, batch shape,
  * partitioning, the decode boundary — is the real production plumbing:
  * swap the fake projection for a `mapPartitions` codec call (one codec
  * init per partition, bounded batches) and the rest of the plan is
  * unchanged.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true),
  ))

  /** Hex-nibble value (0-15) at 1-based position `pos` of an md5 hex
    * string — the deterministic entropy source for the stubs (portable:
    * the DuckDB oracle computes the identical strpos construction). */
  def nib(md5Hex: Column, pos: Int): Column =
    instr(lit("0123456789abcdef"), substring(md5Hex, pos, 1)) - 1

  /** Byte value (0-255) at 1-based byte index of an md5 hex string. */
  def md5Byte(md5Hex: Column, byteIdx: Int): Column =
    nib(md5Hex, 2 * byteIdx - 1) * 16 + nib(md5Hex, 2 * byteIdx)

  /** Synthesize a media table from any table with an id + a string
    * column: payload = utf8 bytes (a stand-in blob), kind round-robins.
    * Fixture generator for tests/benches only. */
  def synthesize(src: DataFrame, idCol: String, textCol: String): DataFrame =
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** ===== DECODE STUB =====
    * Deterministic fake decode: metadata derived from md5(payload).
    * Contract: output schema is fixed; a real deployment swaps this
    * projection for a per-partition codec. */
  def decodeStub(media: DataFrame): DataFrame = {
    val h = md5(col("payload"))
    media.withColumn("meta", struct(
      ((md5Byte(h, 1) % 192 + 1) * 10).cast("int").as("width"),
      ((md5Byte(h, 2) % 108 + 1) * 10).cast("int").as("height"),
      when(col("kind") =!= "image",
        length(col("payload")).cast("long") * 100 + 1000)
        .otherwise(lit(null).cast("long")).as("duration_ms"),
      element_at(array(lit("png"), lit("opus"), lit("h264")),
        (col("media_id") % 3 + 1).cast("int")).as("codec")))
  }

  /** Resize stage (stub): recompute metadata for a target box keeping
    * aspect; payload passes through (a real resize rewrites payload in
    * the same mapPartitions). */
  def resizeStub(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxW.toDouble) / w, lit(maxH.toDouble) / h, lit(1.0))
    decoded.withColumn("meta", struct(
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      col("meta.duration_ms").as("duration_ms"),
      col("meta.codec").as("codec")))
  }

  /** Frame sampling: one output row per sampled frame timestamp for
    * video/audio rows (every `everyMs` ms) — the explode pattern that
    * turns a 100 TB video table into a frames table without ever
    * collecting a payload to the driver. */
  def frameSample(decoded: DataFrame, everyMs: Long = 60000L): DataFrame =
    decoded.filter(col("kind").isin("video", "audio"))
      .select(col("media_id"), col("kind"),
        explode(sequence(lit(0L),
          greatest(col("meta.duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_ts_ms"))

  /** Feature extraction (stub): fixed-dim deterministic pseudo-embedding
    * from md5(payload) bytes, scaled to [-1, 1]. dim ≤ 16. The
    * array<float> one-row-in/one-row-out shape is what a real encoder
    * batch produces. */
  def featureExtractStub(media: DataFrame, dim: Int = 8): DataFrame = {
    require(dim <= 16, "md5 provides 16 bytes")
    val h = md5(col("payload"))
    media.withColumn("features",
      array((1 to dim).map(i =>
        (md5Byte(h, i).cast("double") / 127.5 - 1.0).cast("float")): _*))
  }
}
