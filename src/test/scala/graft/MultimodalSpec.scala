package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.ImageCodec

class MultimodalSpec extends SparkSpec {

  // real PNGs on the image rows — the decode path runs against them
  private def media = Multimodal.pngMedia(
    Tables(spark, sf0001, "documents").limit(60))

  test("pngMedia: binary payload with typed metadata, all kinds present, " +
      "image payloads carry the PNG magic") {
    val rows = media.collect()
    assert(rows.map(_.kind).distinct.sorted.toSeq ===
      Seq("audio", "image", "video"))
    val r = rows.head
    assert(r.payload.nonEmpty && r.width >= 16 && r.sample_rate === 16000)
    rows.filter(_.kind == "image").foreach { img =>
      assert((img.payload(0) & 0xff) === 0x89 &&
        img.payload(1) === 'P'.toByte, s"media ${img.media_id} not a PNG")
    }
  }

  test("golden decode: a synthesized PNG round-trips exact sample values, " +
      "with and without mod-256 wraparound") {
    // seed 5, 4x3: v(i) = 5+i row-major, no wrap
    val img = ImageCodec.decode(ImageCodec.syntheticPng(5, 4, 3))
    assert(img.getWidth === 4 && img.getHeight === 3)
    val samples = for (y <- 0 until 3; x <- 0 until 4)
      yield img.getRaster.getSample(x, y, 0)
    assert(samples === (0 until 12).map(i => 5 + i))
    assert(ImageCodec.stats(ImageCodec.syntheticPng(5, 4, 3)) ===
      ((4, 3, 126L, 836L))) // Σv = 12·5+66; Σ i·v = 5·66 + 506
    // seed 250, 4x2: wraps 250..255,0,1
    assert(ImageCodec.stats(ImageCodec.syntheticPng(250, 4, 2)) ===
      ((4, 2, 1516L, 3812L)))
  }

  test("decode fails loudly on non-image bytes and on metadata that lies " +
      "about dims") {
    intercept[IllegalArgumentException](
      ImageCodec.decode("not a png".getBytes))
    import spark.implicits._
    val lying = Seq(Multimodal.MediaRow(7L, "image",
      ImageCodec.syntheticPng(7, 4, 3), 5, 3, 16000, 1)).toDS()
    val ex = intercept[Exception](
      Multimodal.decodeImageStats(lying).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("decoded dims")), chain(ex).mkString("; "))
  }

  test("golden WAV decode: a synthesized PCM container round-trips exact " +
      "sample values; garbage, lying metadata, and non-PCM16 all abort") {
    import graft.operators.Multimodal.WavCodec
    // seed 5, 8 samples: v(i) = (5 + 37·i) mod 65536 − 32768, no wrap
    val (rate, n, sum, check) = WavCodec.stats(WavCodec.syntheticWav(5, 8, 16000))
    val exp = (0 until 8).map(i => (5L + 37 * i) % 65536 - 32768)
    assert(rate === 16000 && n === 8L)
    assert(sum === exp.sum)
    assert(check === exp.zipWithIndex.map { case (v, i) => i * v }.sum)
    // mod-65536 wraparound: a seed near the top of the range wraps the
    // 16-bit value mid-stream — signed reassembly must follow it
    val seed = 65530L
    val (_, _, wSum, wCheck) = WavCodec.stats(WavCodec.syntheticWav(seed, 300, 8000))
    val wExp = (0 until 300).map(i => (seed + 37 * i) % 65536 - 32768)
    assert(wSum === wExp.sum &&
      wCheck === wExp.zipWithIndex.map { case (v, i) => i.toLong * v }.sum)
    // the hand-written RIFF header (lock-free encode) is byte-identical
    // to what the JDK's own WaveFileWriter emits for the same PCM
    for ((s, n, r) <- Seq((5L, 8, 16000), (65530L, 300, 8000), (0L, 1, 44100))) {
      val ours = WavCodec.syntheticWav(s, n, r)
      val pcm = ours.drop(44)
      val fmt = new javax.sound.sampled.AudioFormat(r.toFloat, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      assert(java.util.Arrays.equals(ours, bos.toByteArray),
        s"hand-written WAV header diverges from the JDK writer (seed=$s)")
    }
    // garbage payload: no reader claims it → loud failure, never 0 rows
    intercept[IllegalArgumentException](WavCodec.stats("not a wav".getBytes))
    import spark.implicits._
    // metadata lies about length (n_frames says 2 → 320 samples; the
    // payload holds 160): the decode-vs-declared check must abort
    val lying = Seq(Multimodal.MediaRow(8L, "audio",
      WavCodec.syntheticWav(8, 160, 16000), 16, 16, 16000, 2)).toDS()
    val ex = intercept[Exception](
      Multimodal.decodeAudioStats(lying).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("decoded")), chain(ex).mkString("; "))
  }

  test("WavCodec boundary: exactly 2^23 samples decodes exact; one over " +
      "rejects loudly (round-13 verdict #7 — the guard, exercised AT its " +
      "bound, not only 4.8k samples under it)") {
    import graft.operators.Multimodal.WavCodec
    val bound = 1 << 23 // 8,388,608 samples ≈ 8.7 min at 16 kHz, 16 MiB PCM
    val seed = 123L
    val (rate, n, sum, check) = WavCodec.stats(
      WavCodec.syntheticWav(seed, bound, 16000))
    assert(rate === 16000 && n === bound.toLong)
    // closed forms over v(i) = (seed + 37i) mod 65536 − 32768: gcd(37,
    // 65536)=1, so over any 65536 consecutive i the residues sweep a
    // full period — recompute directly (8.4M adds) rather than trust it
    var eSum = 0L; var eCheck = 0L; var i = 0
    while (i < bound) {
      val v = (seed + 37L * i) % 65536L - 32768L
      eSum += v; eCheck += i * v; i += 1
    }
    assert(sum === eSum && check === eCheck)
    // one sample past the bound: the s_check accumulator could exceed
    // 2^63 — must abort, not wrap
    val over = intercept[IllegalArgumentException](
      WavCodec.stats(WavCodec.syntheticWav(seed, bound + 1, 16000)))
    assert(over.getMessage.contains("2^23"), over.getMessage)
    // the ENERGY path shares the guarded drain (round-13 advice: it
    // used to skip these guards and emit zero frames on a lying length)
    val overE = intercept[IllegalArgumentException](
      WavCodec.pcm16(WavCodec.syntheticWav(seed, bound + 1, 16000)))
    assert(overE.getMessage.contains("2^23"), overE.getMessage)
  }

  test("decodeAudioEnergy: lying metadata aborts (same contract as stats); " +
      "long-tail clips (doc_id % 97 = 0 -> 1875 frames) decode exact") {
    import spark.implicits._
    import graft.operators.Multimodal.WavCodec
    // payload holds 160 samples; metadata claims 2 frames (320)
    val lying = Seq(Multimodal.MediaRow(8L, "audio",
      WavCodec.syntheticWav(8, 160, 16000), 16, 16, 16000, 2)).toDS()
    val ex = intercept[Exception](
      Multimodal.decodeAudioEnergy(lying).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("decoded")), chain(ex).mkString("; "))
    // a long-tail clip: 1875 frames × 160 = 300k samples, energy exact
    val longRow = Seq(Multimodal.MediaRow(97L, "audio",
      WavCodec.syntheticWav(97L, 1875 * 160, 16000), 16, 16, 16000, 1875)).toDS()
    val e = Multimodal.decodeAudioEnergy(longRow).collect().head
    assert(e.n_frames === 1875)
    var total = 0L; var maxF = 0L; var f = 0L; var i = 0
    while (i < 1875 * 160) {
      val v = (97L + 37L * i) % 65536L - 32768L
      f += v * v; total += v * v; i += 1
      if (i % 160 == 0) { if (f > maxF) maxF = f; f = 0L }
    }
    assert(e.e_total === total && e.e_max_frame === maxF)
  }

  test("decodeAudioStats over wavMedia: audio rows only, stats match the " +
      "generator sequence, payloads carry the RIFF magic") {
    import graft.operators.Multimodal.WavCodec
    val wm = Multimodal.wavMedia(Tables(spark, sf0001, "documents").limit(60))
    wm.filter(_.kind == "audio").collect().foreach { a =>
      assert(a.payload(0) === 'R'.toByte && a.payload(1) === 'I'.toByte,
        s"media ${a.media_id} not a RIFF/WAV")
    }
    val stats = Multimodal.decodeAudioStats(wm).collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      val seed = java.lang.Math.floorMod(s.media_id, 65536L)
      val exp = (0L until s.n_samples).map(i => (seed + 37 * i) % 65536 - 32768)
      assert(s.sample_rate === 16000)
      assert(s.s_sum === exp.sum && s.s_check ===
        exp.zipWithIndex.map { case (v, i) => i.toLong * v }.sum,
        s"media ${s.media_id}")
    }
  }

  test("decodeImageStats: image rows only, stats match the generator grid") {
    val stats = Multimodal.decodeImageStats(media).collect()
    val imgs = media.filter(_.kind == "image").collect()
    assert(stats.length === imgs.length && stats.nonEmpty)
    stats.foreach { s =>
      // regenerate arithmetically: v(i) = (seed + i) mod 256
      val seed = java.lang.Math.floorMod(s.media_id, 256L)
      val n = s.n_px
      val expSum = (0L until n).map(i => (seed + i) % 256).sum
      val expCheck = (0L until n).map(i => i * ((seed + i) % 256)).sum
      assert(s.decoded_w.toLong * s.decoded_h === n)
      assert(s.px_sum === expSum && s.px_check === expCheck,
        s"media ${s.media_id}")
    }
  }

  test("extractFeatures: fixed-dim, deterministic; image features are " +
      "DECODED-raster mean/var; audio keeps the byte-stat invariant") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .sortBy(_.media_id)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    val byId = media.collect().map(r => r.media_id -> r).toMap
    // image: feature(0) = grayscale mean of the DECODED pixels
    val img = f1.filter(_.kind == "image").head
    val (w, h, pxSum, _) = ImageCodec.stats(byId(img.media_id).payload)
    assert(math.abs(img.feature(0) - pxSum.toDouble / (w.toLong * h)) < 1e-3)
    assert(img.feature(1) > 0f, "grayscale variance of a gradient is > 0")
    // audio: byte-statistic stand-in — feature mass = byte mass / 255
    val aud = f1.filter(_.kind == "audio").head
    val expected = byId(aud.media_id).payload.map(b => (b & 0xff) / 255.0).sum
    assert(math.abs(aud.feature.sum - expected) < 1e-3)
  }

  test("sampleVideoFrames: every stride-th fixed-size slice, video only") {
    val frames = Multimodal.sampleVideoFrames(media, frameSize = 32, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 === 0))
    val vids = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(vids))
    // frame 0 of each video is the first 32 payload bytes
    val byId = media.collect().map(r => r.media_id -> r.payload).toMap
    frames.filter(_.frame_idx == 0).foreach { f =>
      assert(f.frame_bytes.toSeq === byId(f.media_id).take(32).toSeq)
    }
  }
}
