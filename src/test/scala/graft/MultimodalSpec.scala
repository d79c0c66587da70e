package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.asMediaRows(
    Multimodal.syntheticMedia(
      Tables(spark, sf0001, "documents").limit(60)))

  test("syntheticMedia: binary payload with typed metadata, all kinds present") {
    val kinds = media.toDF().select("kind").distinct()
      .as[String](spark.implicits.newStringEncoder).collect().sorted
    assert(kinds.toSeq === Seq("audio", "image", "video"))
    val r = media.head()
    assert(r.payload.nonEmpty && r.width >= 16 && r.sample_rate === 16000)
  }

  test("extractFeatures: fixed-dim vectors, deterministic across runs") {
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .sortBy(_.media_id)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
    // feature mass equals total byte mass / 255 (stub invariant)
    val payloads = media.collect().map(r => r.media_id -> r.payload).toMap
    val r = f1.head
    val expected = payloads(r.media_id).map(b => (b & 0xff) / 255.0).sum
    assert(math.abs(r.feature.sum - expected) < 1e-3)
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
