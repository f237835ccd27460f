package graft.multimodal

import graft.SparkSpec
import Multimodal._

/** The decode -> feature -> resize plumbing with the stub codec: schema,
  * batch shape, and determinism are real; only the codec is fake. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, w: Int, h: Int): MediaRecord = {
    val pixels = Array.tabulate(w * h)(i => (i % 251).toFloat)
    MediaRecord(id, "image", StubCodec.encode(pixels, w, h), w, h, 1, 0, 1)
  }

  test("decode round-trips the stub payload deterministically") {
    val ds = Seq(media(1, 8, 6), media(2, 4, 4)).toDS()
    val decoded = decodeImages(ds.toDF().as[MediaRecord]).collect()
      .map(d => d.mediaId -> d).toMap
    assert(decoded(1).pixels.length == 48)
    assert(decoded(1).pixels(5) == 5f) // payload byte 5
    assert(decoded(2).pixels.toSeq == Array.tabulate(16)(i => (i % 251).toFloat).toSeq)
  }

  test("feature extraction computes pixel stats") {
    val ds = Seq(media(7, 4, 4)).toDS()
    val f = imageFeatures(decodeImages(ds.toDF().as[MediaRecord])).head()
    assert(f.mediaId == 7)
    assert(math.abs(f.meanPixel - (0 until 16).sum / 16.0) < 1e-9)
    assert(f.maxPixel == 15.0)
    assert(math.abs(f.nonZeroRatio - 15.0 / 16.0) < 1e-9)
  }

  test("nearest-neighbor resize preserves corners") {
    val ds = Seq(media(3, 8, 8)).toDS()
    val r = resize(decodeImages(ds.toDF().as[MediaRecord]), 4, 4).head()
    assert(r.width == 4 && r.height == 4 && r.pixels.length == 16)
    assert(r.pixels(0) == 0f) // top-left maps to source (0,0)
  }

  test("video frame sampling explodes every k-th frame index") {
    val video = Seq(
      MediaRecord(9, "video", Array[Byte](1), 16, 16, 3, 30, 10)).toDS().toDF()
    val frames = sampleFrames(video, 3).select("frame_idx").as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 3, 6, 9))
  }

  test("metadata-only queries never touch payload bytes (column pruning)") {
    val df = Seq(media(1, 8, 6), media(2, 4, 4)).toDS().toDF()
    val plan = df.select("mediaId", "width", "height")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes"))
  }
}
