package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns + a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as partition-local batch transforms over typed Datasets — the Scala
  * analog of `mapInPandas` (one iterator per partition, vectorizable,
  * no per-row JVM↔interpreter round-trips).
  *
  * The actual codec calls are STUBS (this container has no image/audio
  * libraries): [[StubCodec]] derives deterministic fake pixels/samples
  * from the payload bytes. Everything around the stub — schemas, typed
  * encoders, batch iteration, partitioning, output shapes — is the real
  * production plumbing; swap [[StubCodec]] for a JNI/javacpp codec and
  * nothing else changes.
  *
  * Scale: media rows are large (MBs); transforms are per-row and
  * shuffle-free. Repartition by `media_id` ONLY when a downstream join
  * needs co-location; otherwise let file splits drive parallelism with
  * `spark.sql.files.maxPartitionBytes` sized so one task holds a few
  * dozen payloads in memory.
  */
object Multimodal {

  /** Typed media row: payload + metadata travel together. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  final case class MediaFeature(
      media_id: Long, kind: String, n_bytes: Long, feature: Array[Float])

  final case class Frame(
      media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB codec — deterministic fakes in place of real decoders. */
  object StubCodec {
    /** "Decode" an image: in production this is the JPEG/PNG decoder
      * (??? until a codec lib is linked); the stub derives k fake
      * "pixel statistics" from payload bytes so pipelines are testable
      * end-to-end and byte-deterministic. */
    def imageFeature(payload: Array[Byte], k: Int): Array[Float] = {
      val out = new Array[Float](k)
      var i = 0
      while (i < payload.length) {
        out(i % k) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** "Decode" audio: production = PCM decode + resample; stub =
      * windowed byte energies. */
    def audioFeature(payload: Array[Byte], k: Int): Array[Float] =
      imageFeature(payload, k) // same deterministic shape for the stub

    /** "Sample" every `stride`-th frame of a fake video container whose
      * frames are fixed-size byte slices. */
    def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Iterator[(Int, Array[Byte])] =
      payload.grouped(frameSize).zipWithIndex
        .filter { case (_, idx) => idx % stride == 0 }
        .map { case (bytes, idx) => (idx, bytes) }
  }

  /** Build a deterministic synthetic media table from `documents`: the
    * payload is the utf-8 text bytes (stand-in for real image bytes),
    * metadata derived from doc stats. Real pipelines read
    * `binaryFile` sources or parquet with a binary column instead. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (pmod(col("doc_id"), lit(30)) + 1).cast("int").as("n_frames"))

  /** Partition-local batched feature extraction (mapInPandas analog):
    * one iterator per partition; the stub codec is called per row
    * inside the partition loop. Output keeps a stable, declared shape
    * (fixed-length feature vector). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feat = r.kind match {
          case "audio" => StubCodec.audioFeature(r.payload, dim)
          case _       => StubCodec.imageFeature(r.payload, dim)
        }
        MediaFeature(r.media_id, r.kind, r.payload.length.toLong, feat)
      }
    }
  }

  /** Frame sampling for video rows: one output row per kept frame —
    * a generator (flatMap), partition-local, no shuffle. */
  def sampleVideoFrames(media: Dataset[MediaRow], frameSize: Int = 32,
                        stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      StubCodec.sampleFrames(r.payload, frameSize, stride)
        .map { case (idx, bytes) => Frame(r.media_id, idx, bytes) }
    }
  }

  /** DataFrame → typed media rows (schema gate at the boundary). */
  def asMediaRows(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("kind"), col("payload"),
      col("width"), col("height"), col("sample_rate"), col("n_frames"))
      .as[MediaRow]
  }
}
