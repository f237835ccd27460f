package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.SparkSpec
import Multimodal._

/** The decode -> feature -> resize plumbing with the REAL JDK codec:
  * grayscale PNG encode/decode round-trips exactly (PNG is lossless),
  * color inputs reduce via BT.601 luma, and undecodable bytes fail loudly. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(id: Long, w: Int, h: Int): MediaRecord = {
    val pixels = Array.tabulate(w * h)(i => (i % 251).toFloat)
    MediaRecord(id, "image", ImageCodec.encodePng(pixels, w, h), w, h, 1, 0, 1)
  }

  test("grayscale PNG encode/decode round-trips exactly") {
    val pixels = Array.tabulate(48)(i => (i * 5 % 256).toFloat)
    val png = ImageCodec.encodePng(pixels, 8, 6)
    // PNG magic: real container bytes, not a homemade format
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, decoded) = ImageCodec.decode(png)
    assert(w == 8 && h == 6)
    assert(decoded.toSeq == pixels.toSeq)
  }

  test("decode distributes through Spark and uses decoded dimensions") {
    val ds = Seq(media(1, 8, 6), media(2, 4, 4)).toDS()
    val decoded = decodeImages(ds.toDF().as[MediaRecord]).collect()
      .map(d => d.mediaId -> d).toMap
    assert(decoded(1).width == 8 && decoded(1).height == 6)
    assert(decoded(1).pixels.length == 48)
    assert(decoded(1).pixels(5) == 5f)
    assert(decoded(2).pixels.toSeq == Array.tabulate(16)(i => (i % 251).toFloat).toSeq)
  }

  test("RGB images decode via BT.601 luma") {
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red
    img.setRGB(1, 0, 0x00ff00) // pure green
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    val (w, h, px) = ImageCodec.decode(out.toByteArray)
    assert(w == 2 && h == 1)
    assert(math.abs(px(0) - 0.299f * 255) < 1e-3)
    assert(math.abs(px(1) - 0.587f * 255) < 1e-3)
  }

  test("undecodable bytes fail loudly") {
    intercept[IllegalArgumentException] {
      ImageCodec.decode("not an image at all".getBytes("UTF-8"))
    }
    // a recognized-but-corrupt stream (valid PNG signature, truncated body)
    // must surface the same documented failure type, not a raw IOException
    val png = ImageCodec.encodePng(Array.tabulate(64)(_.toFloat), 8, 8)
    intercept[IllegalArgumentException] {
      ImageCodec.decode(png.take(24))
    }
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
      MediaRecord(9, "video", Array[Byte](1), 16, 16, 3, 30, 10),
      MediaRecord(10, "video", Array[Byte](1), 16, 16, 3, 30, 0)).toDS().toDF()
    val frames = sampleFrames(video, 3).select("frame_idx").as[Int].collect().sorted
    assert(frames.toSeq == Seq(0, 3, 6, 9)) // zero-frame payload dropped
  }

  test("metadata-only queries never touch payload bytes (column pruning)") {
    val df = Seq(media(1, 8, 6), media(2, 4, 4)).toDS().toDF()
    val plan = df.select("mediaId", "width", "height")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("bytes"))
  }
}
