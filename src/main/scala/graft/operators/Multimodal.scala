package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns + a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as partition-local batch transforms over typed Datasets — the Scala
  * analog of `mapInPandas` (one iterator per partition, vectorizable,
  * no per-row JVM↔interpreter round-trips).
  *
  * The IMAGE path is a real codec: [[ImageCodec]] decodes PNG/JPEG/
  * BMP/GIF through JDK `javax.imageio` (ships with the JDK — zero new
  * dependencies) and computes exact pixel statistics; [[pngMedia]]
  * synthesizes genuine PNGs so the decode is exercised end-to-end and
  * oracle-checked (q155, q157). The AUDIO path is a real codec too
  * (round 13): [[WavCodec]] decodes WAV/PCM containers through JDK
  * `javax.sound.sampled` (the JDK's audio framework — WAVE/AIFF/AU
  * file parsers ship in `java.desktop`), and [[wavMedia]] synthesizes
  * genuine 16-bit PCM WAVs so the decode is oracle-checked end-to-end
  * (q158). Only COMPRESSED audio (mp3/aac — the JDK ships no such
  * decoder) and opaque video containers keep the byte-statistic
  * stand-in ([[ByteStatCodec]]), clearly marked, with all the
  * production plumbing — schemas, typed encoders, batch iteration,
  * output shapes — identical to the real paths.
  *
  * Scale: media rows are large (MBs); decode/feature transforms are
  * per-row and shuffle-free — at a 100 TB image lake the cost is
  * decode CPU, embarrassingly parallel across file splits. Repartition
  * by `media_id` ONLY when a downstream join needs co-location;
  * otherwise let file splits drive parallelism with
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

  /** Decoded-image statistics row (q155): dims read from the DECODED
    * raster (validated against declared metadata), exact integer pixel
    * sum and a position-weighted checksum that pins every sample to
    * its row-major slot — a transposed or row-swapped decode cannot
    * pass. */
  final case class ImageStats(
      media_id: Long, decoded_w: Int, decoded_h: Int,
      n_px: Long, px_sum: Long, px_check: Long)

  /** Real image codec over JDK `javax.imageio` (PNG/JPEG/BMP/GIF
    * readers ship in every JDK). PNG is lossless, so [[syntheticPng]]
    * → [[stats]] round-trips exact sample values. */
  object ImageCodec {

    // ImageIO's default ImageInputStream/ImageOutputStream wraps cache
    // to DISK (/tmp FileCacheImageInputStream) — 32 concurrent decode
    // tasks per executor would contend on tmp-file create/delete for
    // payloads that are already fully in memory as byte arrays. Turn
    // the global cache off once at class load: every decode/encode here
    // goes through MemoryCacheImageInputStream instead (pure in-memory,
    // no filesystem touch, no cross-task contention).
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic 8-bit grayscale PNG: sample at (x, y) is
      * `(seed + y*width + x) mod 256` — the row-major flat index
      * offset by the seed, so every pixel value AND position is
      * independently checkable (the q155 oracle regenerates the grid
      * arithmetically in DuckDB). */
    def syntheticPng(seed: Long, width: Int, height: Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0,
            java.lang.Math.floorMod(seed + y.toLong * width + x, 256L).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode or fail loudly: ImageIO returns null when no registered
      * reader claims the bytes — silently treating garbage as a
      * zero-pixel image is how a curation pipeline ships junk. */
    def decode(payload: Array[Byte]): BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "payload is not a decodable image (no ImageIO reader claims it)")
      img
    }

    /** Exact first-band pixel statistics of a decoded image:
      * `px_sum = Σ v(i)`, `px_check = Σ i·v(i)` over row-major index
      * `i = y*w + x`. Integer-exact: `px_check ≤ 255·n(n−1)/2 ≈
      * 128·n²`, so n ≤ 2^27 pixels (134 MPx — beyond any training
      * image) keeps it under 2^63; the require guards the bound
      * instead of overflowing silently. */
    def stats(payload: Array[Byte]): (Int, Int, Long, Long) = {
      val img = decode(payload)
      val r = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      require(w.toLong * h <= (1L << 27),
        s"image too large for exact int64 checksum: ${w}x$h")
      var sum = 0L
      var check = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = r.getSample(x, y, 0).toLong
          sum += v
          check += (y.toLong * w + x) * v
          x += 1
        }
        y += 1
      }
      (w, h, sum, check)
    }

    /** Feature vector from the DECODED raster: per-band mean and
      * variance (population), flattened `[mean0, var0, mean1, …]` and
      * fitted to `k` (zero-padded / truncated) — a fixed declared
      * shape like any embedding column. */
    def feature(payload: Array[Byte], k: Int): Array[Float] = {
      val img = decode(payload)
      val r = img.getRaster
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      val bands = r.getNumBands
      val out = new Array[Float](k)
      var b = 0
      while (b < bands && 2 * b < k) {
        var sum = 0L
        var sumSq = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = r.getSample(x, y, b).toLong
            sum += v
            sumSq += v * v
            x += 1
          }
          y += 1
        }
        val mean = sum.toDouble / n
        out(2 * b) = mean.toFloat
        if (2 * b + 1 < k)
          out(2 * b + 1) = (sumSq.toDouble / n - mean * mean).toFloat
        b += 1
      }
      out
    }
  }

  /** Decoded-audio statistics row (q158): frame count and rate read
    * from the DECODED stream (validated against declared metadata),
    * exact integer sample sum and a position-weighted checksum that
    * pins every sample to its slot — a byte-swapped, truncated, or
    * resampled decode cannot pass. */
  final case class AudioStats(
      media_id: Long, sample_rate: Int, n_samples: Long,
      s_sum: Long, s_check: Long)

  /** Real audio codec over JDK `javax.sound.sampled` (the WAVE/AIFF/AU
    * file parsers ship in `java.desktop`; PCM is lossless, so
    * [[syntheticWav]] → [[stats]] round-trips exact sample values).
    * The readers are stateless and fully in-memory — no disk cache to
    * contend on at 32-way parallelism (unlike ImageIO's default). */
  object WavCodec {

    /** Samples per declared metadata frame: 10 ms at 16 kHz — the
      * conventional speech-pipeline hop, and the contract tying the
      * MediaRow `n_frames` column to the decoded stream length. */
    val SamplesPerFrame = 160

    /** The platform WAVE reader, resolved ONCE through the public
      * `AudioFileReader` SPI. `AudioSystem.getAudioInputStream`
      * funnels EVERY call through a globally `synchronized` provider
      * lookup (`JDK13Services.getProviders`), which serializes a
      * 32-way decode stage — measured 45× slower than a cached reader
      * under 16 threads (20k decodes: 0.91 s vs 0.02 s), and it made
      * q158/q159 the slowest queries of the 100× sweep (~60 s; ~2 s
      * after this cache). The reader instance is a stateless parser,
      * safe to share across tasks. */
    private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
      val probe = syntheticWav(0, 1, 8000)
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      var found: Option[javax.sound.sampled.spi.AudioFileReader] = None
      while (found.isEmpty && it.hasNext) {
        val r = it.next()
        try {
          r.getAudioInputStream(new java.io.ByteArrayInputStream(probe)).close()
          found = Some(r)
        } catch { case _: Exception => () }
      }
      found
    }

    /** Deterministic 16-bit mono PCM WAV: sample i is
      * `(seed + 37·i) mod 65536 − 32768` — position-dependent (37 is
      * coprime to 65536, so consecutive samples differ) and
      * regenerable arithmetically in DuckDB (the q158 oracle). The
      * 44-byte RIFF/WAVE header is written by hand (byte-identical to
      * `AudioSystem.write`'s output — MultimodalSpec pins that) so the
      * encode never takes the AudioSystem global lock either. */
    def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
      require(nSamples > 0 && sampleRate > 0,
        s"bad audio dims n=$nSamples rate=$sampleRate")
      val dataLen = nSamples * 2
      val out = new Array[Byte](44 + dataLen)
      def ascii(o: Int, s: String): Unit = {
        var j = 0; while (j < s.length) { out(o + j) = s.charAt(j).toByte; j += 1 }
      }
      def w16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def w32(o: Int, v: Int): Unit = { w16(o, v & 0xffff); w16(o + 2, v >>> 16) }
      ascii(0, "RIFF"); w32(4, 36 + dataLen); ascii(8, "WAVE")
      ascii(12, "fmt "); w32(16, 16)
      w16(20, 1) /* PCM */ ; w16(22, 1) /* mono */
      w32(24, sampleRate); w32(28, sampleRate * 2) /* byte rate */
      w16(32, 2) /* block align */ ; w16(34, 16) /* bits */
      ascii(36, "data"); w32(40, dataLen)
      var i = 0
      while (i < nSamples) {
        val v = java.lang.Math.floorMod(seed + 37L * i, 65536L) - 32768L
        out(44 + 2 * i) = (v & 0xff).toByte
        out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Decode or fail loudly: a payload no audio reader claims (or a
      * non-PCM16 encoding this codec doesn't own) must never flow
      * silently into a training manifest as zero samples. The cached
      * WAVE reader is the fast path; anything it rejects falls back to
      * the full `AudioSystem` probe (AIFF/AU PCM still decodes, just
      * on the slow path) before failing. */
    def decode(payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      def slowPath() =
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
      val in =
        try wavReader match {
          case Some(r) =>
            try r.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
            catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException =>
                slowPath()
            }
          case None => slowPath()
        }
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              "payload is not a decodable audio container " +
                "(no javax.sound.sampled reader claims it)", e)
        }
      val f = in.getFormat
      require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"unsupported audio encoding $f (this codec owns 16-bit mono " +
          "little-endian PCM; compressed audio has no JDK decoder)")
      in
    }

    /** Decode and drain a payload into its raw PCM16 sample bytes,
      * guarded: the container's declared frame length must be known,
      * non-negative, within the exact-int64 checksum bound (n ≤ 2^23
      * samples — ~8.7 min at 16 kHz, beyond any training clip), and
      * the drained byte count must match it. EVERY consumer of decoded
      * samples goes through here, so a lying container (unknown length
      * -1, truncated data chunk, >2^31-frame stream) fails loudly on
      * all paths instead of only in [[stats]] (round-13 advice: the
      * energy path skipped these guards and `.toInt` on an unknown
      * length silently emitted zero frames). */
    def pcm16(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      val in = decode(payload)
      val nL = in.getFrameLength
      require(nL >= 0 && nL <= (1L << 23),
        s"audio length unusable for exact int64 checksums: $nL samples " +
          "(unknown/negative, or past the 2^23 bound)")
      val n = nL.toInt
      val bytes = in.readAllBytes()
      require(bytes.length == 2 * n,
        s"decoded ${bytes.length} bytes for $n declared frames")
      (in.getFormat.getSampleRate.toInt, n, bytes)
    }

    /** Exact sample statistics of a decoded stream:
      * `s_sum = Σ v(i)`, `s_check = Σ i·v(i)` over the sample index.
      * `|s_check| ≤ 32768·n(n−1)/2`, so the [[pcm16]] bound n ≤ 2^23
      * keeps it under 2^63 instead of overflowing silently. */
    def stats(payload: Array[Byte]): (Int, Long, Long, Long) = {
      val (rate, n, bytes) = pcm16(payload)
      var sum = 0L
      var check = 0L
      var i = 0
      while (i < n) {
        val v = ((bytes(2 * i + 1).toLong << 8) | (bytes(2 * i) & 0xffL))
        sum += v
        check += i.toLong * v
        i += 1
      }
      (rate, n.toLong, sum, check)
    }
  }

  /** Byte-statistic stand-in features for modalities the JDK ships no
    * decoder for (COMPRESSED audio — mp3/aac — and opaque video
    * containers):
    * windowed byte energies, deterministic in the payload. Clearly a
    * fake — a real pipeline links an audio codec here; the Spark-side
    * plumbing (schema, batching, output shape) is identical either
    * way. */
  object ByteStatCodec {
    def feature(payload: Array[Byte], k: Int): Array[Float] = {
      val out = new Array[Float](k)
      var i = 0
      while (i < payload.length) {
        out(i % k) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    /** "Sample" every `stride`-th frame of a fake video container whose
      * frames are fixed-size byte slices. */
    def sampleFrames(payload: Array[Byte], frameSize: Int, stride: Int): Iterator[(Int, Array[Byte])] =
      payload.grouped(frameSize).zipWithIndex
        .filter { case (_, idx) => idx % stride == 0 }
        .map { case (bytes, idx) => (idx, bytes) }
  }

  /** Build a deterministic synthetic media table from `documents`: the
    * payload is the utf-8 text bytes (opaque-binary plumbing — q25/q26
    * byte-level stats), metadata derived from doc stats. Real
    * pipelines read `binaryFile` sources or parquet with a binary
    * column instead; [[pngMedia]] is the variant with DECODABLE image
    * payloads. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      // long-clip tail (round-13 verdict #7): every 97th clip is 1875
      // frames — 300k samples, an 18.75 s utterance at 16 kHz — so the
      // decode benches price realistic clip lengths, not only the
      // ≤0.3 s shorts the 1–30 frame mod produces
      when(pmod(col("doc_id"), lit(97)) === 0, lit(1875))
        .otherwise(pmod(col("doc_id"), lit(30)) + 1)
        .cast("int").as("n_frames"))

  /** [[syntheticMedia]] with REAL payloads on image rows: a genuine
    * grayscale PNG (seed `media_id mod 256`, declared dims) produced
    * by the same `ImageIO` stack that decodes it. Partition-local map
    * — the encode is the fixture's cost, not a shuffle. */
  def pngMedia(docs: DataFrame): Dataset[MediaRow] = {
    val rows = asMediaRows(syntheticMedia(docs))
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { r =>
      if (r.kind == "image")
        r.copy(payload = ImageCodec.syntheticPng(
          java.lang.Math.floorMod(r.media_id, 256L), r.width, r.height))
      else r
    })
  }

  /** [[syntheticMedia]] with REAL payloads on audio rows: a genuine
    * 16-bit mono PCM WAV (seed `media_id mod 65536`, declared
    * sample_rate, `n_frames × SamplesPerFrame` samples) produced by
    * the same `javax.sound.sampled` stack that decodes it.
    * Partition-local map — the encode is the fixture's cost, not a
    * shuffle. */
  def wavMedia(docs: DataFrame): Dataset[MediaRow] = {
    val rows = asMediaRows(syntheticMedia(docs))
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { r =>
      if (r.kind == "audio")
        r.copy(payload = WavCodec.syntheticWav(
          java.lang.Math.floorMod(r.media_id, 65536L),
          r.n_frames * WavCodec.SamplesPerFrame, r.sample_rate))
      else r
    })
  }

  /** Decode every audio row and emit exact sample statistics, failing
    * loudly when the decoded rate or length disagrees with the
    * declared metadata (a lying metadata column must never flow
    * silently into a training manifest). Partition-local,
    * shuffle-free — at a 100 TB audio lake this plan is pure decode
    * CPU across file splits. */
  def decodeAudioStats(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { r =>
      val (rate, n, sum, check) = WavCodec.stats(r.payload)
      require(rate == r.sample_rate,
        s"decoded rate $rate != declared ${r.sample_rate} for media ${r.media_id}")
      require(n == r.n_frames.toLong * WavCodec.SamplesPerFrame,
        s"decoded $n samples != declared ${r.n_frames} frames x " +
          s"${WavCodec.SamplesPerFrame} for media ${r.media_id}")
      AudioStats(r.media_id, rate, n, sum, check)
    })
  }

  /** Decoded-audio energy row (q159): the feature a VAD / audio
    * quality gate consumes — total energy and the hottest 10 ms frame,
    * both exact integer sums of squared decoded samples. */
  final case class AudioEnergy(
      media_id: Long, n_frames: Int, e_total: Long, e_max_frame: Long)

  /** Decode every audio row and emit exact frame-energy features:
    * `e_total = Σ v²` over all samples, `e_max_frame = max over 10 ms
    * frames of Σ v²` within the frame. Integer-exact (v² ≤ 2^30, so a
    * 2^23-sample clip stays under 2^53) and shuffle-free. Same lying-
    * metadata contract as [[decodeAudioStats]]: the guarded
    * [[WavCodec.pcm16]] drain plus a declared-vs-decoded cross-check,
    * so a truncated or mislabeled clip aborts instead of flowing into
    * a VAD as silence. */
  def decodeAudioEnergy(media: Dataset[MediaRow]): Dataset[AudioEnergy] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions(_.map { r =>
      val (rate, n, bytes) = WavCodec.pcm16(r.payload)
      require(rate == r.sample_rate,
        s"decoded rate $rate != declared ${r.sample_rate} for media ${r.media_id}")
      require(n.toLong == r.n_frames.toLong * WavCodec.SamplesPerFrame,
        s"decoded $n samples != declared ${r.n_frames} frames x " +
          s"${WavCodec.SamplesPerFrame} for media ${r.media_id}")
      var total = 0L
      var maxFrame = 0L
      var frame = 0L
      var i = 0
      while (i < n) {
        val v = (bytes(2 * i + 1).toLong << 8) | (bytes(2 * i) & 0xffL)
        frame += v * v
        total += v * v
        i += 1
        if (i % WavCodec.SamplesPerFrame == 0 || i == n) {
          if (frame > maxFrame) maxFrame = frame
          frame = 0L
        }
      }
      AudioEnergy(r.media_id,
        (n + WavCodec.SamplesPerFrame - 1) / WavCodec.SamplesPerFrame,
        total, maxFrame)
    })
  }

  /** Decode every image row and emit exact pixel statistics, failing
    * loudly when the decoded dims disagree with the declared metadata
    * (a lying metadata column must never flow silently into a
    * training manifest). Partition-local, shuffle-free. */
  def decodeImageStats(media: Dataset[MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { r =>
      val (w, h, sum, check) = ImageCodec.stats(r.payload)
      require(w == r.width && h == r.height,
        s"decoded dims ${w}x$h != declared ${r.width}x${r.height} " +
          s"for media ${r.media_id}")
      ImageStats(r.media_id, w, h, w.toLong * h, sum, check)
    })
  }

  /** Partition-local batched feature extraction (mapInPandas analog):
    * one iterator per partition. Images go through the REAL decoder
    * ([[ImageCodec.feature]] — per-band mean/variance of the decoded
    * raster); audio/video use the byte-statistic stand-in. Output
    * keeps a stable, declared shape (fixed-length feature vector). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val feat = r.kind match {
          case "image" => ImageCodec.feature(r.payload, dim)
          case _       => ByteStatCodec.feature(r.payload, dim)
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
      ByteStatCodec.sampleFrames(r.payload, frameSize, stride)
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
