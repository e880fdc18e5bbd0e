package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines.
  *
  * Images/audio/video are carried as opaque `binary` columns with typed
  * metadata; the Spark-side plumbing (schema, partitioning, batch shape,
  * integrity) is real, while the codec step is a clearly-marked deterministic
  * STUB — the decode libraries are not in this container. Swapping
  * [[stubDecodeImage]] for a real decoder keeps every schema and plan shape.
  */
object Multimodal {

  /** Canonical media-row schema: (media_id, kind, payload binary, meta). */
  def asMediaTable(df: DataFrame, idCol: String, payloadStrCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      // payload: opaque bytes (here: the UTF-8 of the source column — the
      // container has no real media; byte-level plumbing is what's tested)
      encode(col(payloadStrCol), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("payload_sha", sha2(col("payload"), 256))

  /** STUB image decode: a real implementation would decode `payload` with an
    * image codec (not present in this container). The stub derives
    * deterministic fake dimensions and a 8-dim "feature vector" from payload
    * bytes, preserving the exact output schema a real decoder would have:
    * struct(width int, height int, channels int, features array<float>).
    */
  def stubDecodeImage(payload: Column): Column = {
    val h = crc32(payload)
    struct(
      (pmod(h, lit(1024)) + 32).cast("int").as("width"),
      (pmod(shiftright(h, 10), lit(1024)) + 32).cast("int").as("height"),
      lit(3).as("channels"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(call_function("shiftright", h, i * 4), lit(256)) / lit(255.0)).cast("float"))
        .as("features"))
  }

  /** STUB resize: real impl maps payload -> payload; the stub records the
    * requested geometry so plan shape and lineage are real.
    */
  def stubResize(decoded: Column, w: Int, hgt: Int): Column =
    struct(lit(w).as("width"), lit(hgt).as("height"),
      decoded.getField("channels").as("channels"),
      decoded.getField("features").as("features"))

  /** STUB frame sampling for video-kind rows: every `stride`-th synthetic
    * frame index up to n_frames derived from payload size.
    */
  def stubSampleFrames(payload: Column, stride: Int): Column = {
    val nFrames = (octet_length(payload) / 100 + 1).cast("int")
    filter(sequence(lit(0), nFrames - 1), i => i % stride === 0)
  }

  /** Feature-extraction pipeline over a media table: decode -> resize ->
    * features, partition-preserving (map-only; no shuffle).
    */
  def extractFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("decoded", stubDecodeImage(col("payload")))
      .withColumn("resized", stubResize(col("decoded"), 224, 224))
      .select(col("media_id"), col("kind"), col("n_bytes"), col("payload_sha"),
        col("resized.width").as("width"), col("resized.height").as("height"),
        col("resized.features").as("features"))
}
