package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed per-partition
  * in batches.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, per-partition
  * iteration) is real and tested; the codec itself is a clearly-marked
  * deterministic STUB ([[FakeCodec]]) because no image/audio libraries ship
  * in this environment — swapping in a real decoder touches only
  * `FakeCodec.decode`.
  *
  * Scale notes: media payloads dominate row size, so the pipeline
  * (a) never collects payloads to the driver, (b) processes rows with
  * `mapPartitions` so a real codec can amortize per-batch init (model load,
  * JNI handles) across a partition, and (c) repartitions by a salt-able id
  * hash so a few huge payloads do not skew executors.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      sample_rate: Option[Int])

  /** Extracted features (fixed schema regardless of modality). */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** STUB codec — deterministic fake standing in for image/audio decode.
    * Replace `decode` with a real library call; everything around it
    * (schema, batching, partitioning) is production-shaped.
    */
  object FakeCodec {
    val FeatureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      // Deterministic "feature": byte-histogram moments — NOT a real decode.
      val f = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      f
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      h
    }
  }

  /** Decode + featurize, partition-parallel. `partitions` sizes the stage to
    * the cluster (payload bytes per partition, not row count, is the real
    * constraint for media).
    */
  def extractFeatures(media: Dataset[MediaRecord], partitions: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(partitions, col("media_id"))
      .mapPartitions { rows =>
        // Per-partition init hook: a real codec opens handles/models here.
        rows.map { r =>
          MediaFeatures(
            r.media_id,
            r.media_type,
            r.payload.length.toLong,
            FakeCodec.checksum(r.payload),
            FakeCodec.decode(r.payload))
        }
      }
  }

  /** Frame-sampling shape for video: 1→N expansion of a payload into frame
    * offsets (stub: fixed stride over the byte stream). Proves the
    * explode-style multimodal fan-out without a real container parser.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int): DataFrame = {
    val df = media.toDF()
    df.filter(col("media_type") === "video" && length(col("payload")) > 0) // empty payload has no frames
      .select(
        col("media_id"),
        explode(sequence(lit(0L), greatest(ceil(length(col("payload")) / frameBytes) - 1, lit(0L)), lit(1L)))
          .as("frame_idx"))
  }

  /** Feature-extraction summary registered as a (rows-only) qkey: the
    * pipeline is deterministic but its input is the synthetic media table,
    * not a driver parquet table, so there is no SQL oracle.
    */
  val defs: Seq[graft.engine.QueryDef] = Seq(
    graft.engine.QueryDef(
      "multimodal_features",
      (s, _) =>
        extractFeatures(syntheticMedia(s, 300), partitions = 8)
          .toDF()
          .groupBy(org.apache.spark.sql.functions.col("media_type"))
          .agg(
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("cnt"),
            org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("n_bytes")).as("total_bytes")),
      None),
  )

  /** Deterministic synthetic media table (for tests and demos). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val mt = Seq("image", "audio", "video")((i % 3).toInt)
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 31 + j * 7) % 251).toByte)
      MediaRecord(i, mt,
        payload,
        if (mt == "image") Some(64) else None,
        if (mt == "image") Some(48) else None,
        if (mt == "audio") Some(16000) else None)
    }
  }
}
