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

  test("golden MJPEG-AVI decode: per-block-constant JPEG frames round-trip " +
      "EXACT sample values through the hand-written RIFF container; " +
      "garbage, lying sizes, foreign fourccs, and frame-count lies abort") {
    import graft.operators.Multimodal.MjpegAviCodec
    // seed 7, 3 frames, 24x16 (full 8x8 blocks: 3 cols x 2 rows = 6/frame)
    val avi = MjpegAviCodec.syntheticMjpegAvi(7L, 3, 24, 16)
    assert(avi(0) === 'R'.toByte && avi(1) === 'I'.toByte)
    val (w, h, nf, sum, check) = MjpegAviCodec.stats(avi)
    assert(w === 24 && h === 16 && nf === 3)
    // regenerate the grid arithmetically (what the q160 oracle does)
    var eSum = 0L; var eCheck = 0L
    for (f <- 0 until 3; y <- 0 until 16; x <- 0 until 24) {
      val v = MjpegAviCodec.blockValue(7L, f, (y / 8) * 3 + (x / 8)).toLong
      eSum += v
      eCheck += (f.toLong * 24 * 16 + y * 24 + x) * v
    }
    assert(sum === eSum && check === eCheck,
      "JPEG decode must be EXACT on per-block-constant frames")
    // value wraparound across the mod-256 boundary decodes exact too
    val (_, _, _, s2, c2) = MjpegAviCodec.stats(
      MjpegAviCodec.syntheticMjpegAvi(250L, 2, 16, 16))
    var e2s = 0L; var e2c = 0L
    for (f <- 0 until 2; y <- 0 until 16; x <- 0 until 16) {
      val v = MjpegAviCodec.blockValue(250L, f, (y / 8) * 2 + (x / 8)).toLong
      e2s += v; e2c += (f.toLong * 256 + y * 16 + x) * v
    }
    assert(s2 === e2s && c2 === e2c)
    // frameSums agree with stats' per-frame decomposition
    val (_, _, sums) = MjpegAviCodec.frameSums(avi)
    assert(sums.length === 3 && sums.sum === eSum)
    // garbage: no RIFF magic
    intercept[IllegalArgumentException](
      MjpegAviCodec.stats("not an avi".getBytes))
    // a WAV is RIFF but not AVI — the fourcc gate must catch it
    intercept[IllegalArgumentException](MjpegAviCodec.stats(
      graft.operators.Multimodal.WavCodec.syntheticWav(1, 16, 8000)))
    // RIFF size field lying about the payload
    val lying = avi.clone(); lying(4) = (lying(4) ^ 0x01).toByte
    val exSz = intercept[IllegalArgumentException](MjpegAviCodec.stats(lying))
    assert(exSz.getMessage.contains("RIFF size"), exSz.getMessage)
    // foreign video fourcc (e.g. real-world 'H264'): no JDK decoder —
    // must abort loudly, never flow through the byte-stat stand-in
    val h264 = avi.clone()
    // strh fccHandler at offset 112, strf biCompression at offset 188
    for ((o, c) <- Seq((112, "H264"), (188, "H264")); i <- 0 until 4)
      h264(o + i) = c.charAt(i).toByte
    val exCc = intercept[IllegalArgumentException](MjpegAviCodec.stats(h264))
    assert(exCc.getMessage.contains("no JDK decoder"), exCc.getMessage)
    // header frame-count lie: avih dwTotalFrames (off 48) and strh
    // dwLength (off 140) claim 4 frames, movi holds 3
    val fLie = avi.clone()
    fLie(48) = 4.toByte; fLie(140) = 4.toByte
    val exFr = intercept[IllegalArgumentException](MjpegAviCodec.stats(fLie))
    assert(exFr.getMessage.contains("frames"), exFr.getMessage)
    // the 2^27 sample bound fires on the PARSED header, before any
    // decode: patch both frame counts to 2^20 (2^20 * 384 px > 2^27)
    val huge = avi.clone()
    for (o <- Seq(48, 140)) {
      huge(o) = 0; huge(o + 1) = 0; huge(o + 2) = 16.toByte; huge(o + 3) = 0
    }
    val exBig = intercept[IllegalArgumentException](MjpegAviCodec.stats(huge))
    assert(exBig.getMessage.contains("2^27"), exBig.getMessage)
  }

  test("aviMedia + decodeVideoStats/Motion: video rows only, MCU-snapped " +
      "dims, stats match the block grid; lying metadata aborts; " +
      "sampleAviFrames extracts decodable standalone JPEGs") {
    import graft.operators.Multimodal.MjpegAviCodec
    val am = Multimodal.aviMedia(Tables(spark, sf0001, "documents").limit(60))
    val vids = am.filter(_.kind == "video").collect()
    assert(vids.nonEmpty)
    vids.foreach { v =>
      assert(v.width % 8 === 0 && v.height % 8 === 0 && v.n_frames <= 30)
      assert(v.payload(0) === 'R'.toByte, s"media ${v.media_id} not RIFF")
    }
    val stats = Multimodal.decodeVideoStats(am).collect()
    assert(stats.map(_.media_id).toSet === vids.map(_.media_id).toSet)
    stats.foreach { s =>
      val seed = java.lang.Math.floorMod(s.media_id, 256L)
      val cpr = s.decoded_w / 8
      var eSum = 0L
      for (f <- 0 until s.n_frames; by <- 0 until s.decoded_h / 8; bx <- 0 until cpr)
        eSum += 64L * MjpegAviCodec.blockValue(seed, f, by * cpr + bx)
      assert(s.px_sum === eSum, s"media ${s.media_id}")
    }
    // motion face: replay the per-frame delta chain from the grid
    val motion = Multimodal.decodeVideoMotion(am).collect()
    motion.foreach { m =>
      val v = vids.find(_.media_id == m.media_id).get
      val cpr = v.width / 8
      val bpf = cpr * (v.height / 8)
      val seed = java.lang.Math.floorMod(m.media_id, 256L)
      val sums = (0 until m.n_frames).map(f =>
        (0 until bpf).map(b => 64L * MjpegAviCodec.blockValue(seed, f, b)).sum)
      val deltas = sums.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.toSeq
      assert(m.first_frame_sum === sums.head)
      assert(m.motion_l1 === deltas.sum && m.peak_delta ===
        (if (deltas.isEmpty) 0L else deltas.max), s"media ${m.media_id}")
    }
    // metadata lies about frame count → abort (q160's contract)
    import spark.implicits._
    val lying = Seq(Multimodal.MediaRow(5L, "video",
      MjpegAviCodec.syntheticMjpegAvi(5L, 2, 16, 16), 16, 16, 16000, 3)).toDS()
    val ex = intercept[Exception](Multimodal.decodeVideoStats(lying).collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("decoded")), chain(ex).mkString("; "))
    // container-level frame sampling: every stride-th chunk, each a
    // standalone decodable JPEG with the right frame's block values
    val one = Seq(Multimodal.MediaRow(9L, "video",
      MjpegAviCodec.syntheticMjpegAvi(9L, 7, 16, 16), 16, 16, 16000, 7)).toDS()
    val frames = Multimodal.sampleAviFrames(one, stride = 3).collect()
    assert(frames.map(_.frame_idx).sorted.toSeq === Seq(0, 3, 6))
    frames.foreach { fr =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fr.frame_bytes))
      assert(img.getWidth === 16 && img.getHeight === 16)
      assert(img.getRaster.getSample(0, 0, 0) ===
        MjpegAviCodec.blockValue(9L, fr.frame_idx, 0))
    }
  }

  test("mediaVerdicts over realMedia: every modality decodes ok; keep " +
      "rules replay from the generators; bad rows come back ok=false " +
      "with a reason instead of killing the pass") {
    import spark.implicits._
    import graft.operators.Multimodal.{MjpegAviCodec, WavCodec}
    val rm = Multimodal.realMedia(Tables(spark, sf0001, "documents").limit(90))
    val verdicts = Multimodal.mediaVerdicts(rm).collect()
    assert(verdicts.length === 90 && verdicts.forall(_.ok),
      verdicts.filterNot(_.ok).take(3).mkString("; "))
    assert(Set("image", "audio", "video").subsetOf(verdicts.map(_.kind).toSet))
    // replay each keep rule from the generator arithmetic
    verdicts.foreach { v =>
      val expected = v.kind match {
        case "image" =>
          val w = (v.media_id % 64 + 16).toInt; val h = (v.media_id % 48 + 16).toInt
          val n = w.toLong * h
          val sum = (0L until n).map(i => (v.media_id % 256 + i) % 256).sum
          n >= 2048L && 120L * n <= sum && sum <= 136L * n
        case "audio" =>
          val nf = if (v.media_id % 97 == 0) 1875 else (v.media_id % 30 + 1).toInt
          val n = nf * 160
          val total = (0L until n).map { i =>
            val s = (v.media_id % 65536 + 37 * i) % 65536 - 32768; s * s
          }.sum
          nf >= 3 && total >= 268435456L * n
        case _ =>
          val nf = (v.media_id % 30 + 1).toInt
          val cpr = (v.media_id % 64 + 16).toInt / 8
          val bpf = cpr * ((v.media_id % 48 + 16).toInt / 8)
          val sums = (0 until nf).map(f => (0 until bpf)
            .map(b => 64L * MjpegAviCodec.blockValue(v.media_id % 256, f, b)).sum)
          val l1 = sums.sliding(2).collect { case Seq(a, b) => math.abs(b - a) }.sum
          nf >= 2 && l1 >= (nf - 1).toLong
      }
      assert(v.keep === expected, s"media ${v.media_id} (${v.kind})")
    }
    // rotten rows quarantine, never throw: garbage payload, lying image
    // dims, lying audio length, unknown modality
    val bad = Seq(
      Multimodal.MediaRow(1L, "image", "not a png".getBytes, 16, 16, 16000, 1),
      Multimodal.MediaRow(2L, "image",
        graft.operators.Multimodal.ImageCodec.syntheticPng(2, 4, 3), 5, 3, 16000, 1),
      Multimodal.MediaRow(3L, "audio",
        WavCodec.syntheticWav(3, 160, 16000), 16, 16, 16000, 2),
      Multimodal.MediaRow(4L, "pdf", "%PDF".getBytes, 0, 0, 0, 0)).toDS()
    val bv = Multimodal.mediaVerdicts(bad).collect().sortBy(_.media_id)
    assert(bv.forall(v => !v.ok && !v.keep && v.reason.nonEmpty))
    assert(bv(1).reason.contains("decoded dims"))
    assert(bv(2).reason.contains("decoded"))
    assert(bv(3).reason.contains("unknown modality"))
  }

  test("quarantining catches NonFatal only: a decode RuntimeException " +
      "becomes an ok=false verdict, but a task-cancellation interrupt " +
      "propagates instead of minting a bogus quarantine row") {
    val q = Multimodal.quarantining(7L, "image") {
      throw new RuntimeException("payload truncated at byte 12")
    }
    assert(!q.ok && !q.keep && q.reason === "payload truncated at byte 12")
    // require() failures (lying metadata) are IllegalArgumentException —
    // also NonFatal, also quarantined
    val q2 = Multimodal.quarantining(8L, "audio") {
      require(false, "decoded rate 8000 != declared 16000"); ???
    }
    assert(!q2.ok && q2.reason.contains("decoded rate"))
    // Spark kills tasks by interrupt: must PROPAGATE (NonFatal does not
    // match InterruptedException), never become a committed verdict
    intercept[InterruptedException] {
      Multimodal.quarantining(9L, "video") { throw new InterruptedException() }
    }
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

  test("AVI container-region corruption either aborts loudly or decodes " +
      "IDENTICALLY — no flip can silently change the result") {
    import graft.operators.Multimodal.MjpegAviCodec
    val payload = MjpegAviCodec.syntheticMjpegAvi(7, 3, 16, 16)
    val info = MjpegAviCodec.parse(payload)
    val base = MjpegAviCodec.stats(payload)
    // the container region: RIFF/hdrl/strl headers up to the first
    // movi chunk. Meaningful bytes (magic, sizes, fourccs, dims, frame
    // counts) are require-guarded; don't-care bytes (rates, reserved
    // words) must not affect the decoded stream. Either way a flip can
    // never SILENTLY alter what a consumer reads. (JPEG payload bytes
    // are excluded: changing pixel DATA is a legitimate different
    // input, not a container lie.)
    val rnd = new scala.util.Random(42)
    var aborted = 0
    var benign = 0
    for (trial <- 1 to 150) {
      val i = rnd.nextInt(info.moviStart)
      val mut = payload.clone()
      mut(i) = (mut(i) + 1 + rnd.nextInt(255)).toByte
      try {
        val s = MjpegAviCodec.stats(mut)
        assert(s === base,
          s"trial $trial: flipping container byte $i changed the decode SILENTLY")
        benign += 1
      } catch {
        case _: IllegalArgumentException => aborted += 1 // a require fired
      }
    }
    // both classes must actually occur, or the sweep proves nothing
    assert(aborted > 50, s"only $aborted/150 flips aborted")
    assert(benign > 10, s"only $benign/150 flips were don't-care bytes")
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
