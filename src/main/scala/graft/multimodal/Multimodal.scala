package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode / feature /
  * resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * mapPartitions (the Scala analog of `mapInPandas`: one iterator per batch,
  * no per-row serialization points), deterministic batch shapes — while the
  * actual codec is STUBBED: this container has no image/audio libraries, so
  * [[StubCodec]] implements a self-describing fixture format instead of
  * JPEG/PNG/WAV. Swapping in a real codec changes only the two
  * clearly-marked functions inside StubCodec.
  */
object Multimodal {

  /** One media object: payload + typed metadata (never decode to read
    * metadata — it is first-class columnar data, filterable/prunable at the
    * parquet scan). */
  case class MediaRecord(
      mediaId: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      channels: Int,
      sampleRate: Int, // audio/video only; 0 otherwise
      nFrames: Int) // video only; 1 for image

  case class DecodedImage(
      mediaId: Long,
      width: Int,
      height: Int,
      pixels: Array[Float]) // row-major grayscale

  case class ImageFeatures(
      mediaId: Long,
      meanPixel: Double,
      maxPixel: Double,
      nonZeroRatio: Double)

  /** ================= STUB CODEC =================
    * A deterministic fake in place of image/audio libs (absent in this
    * container). Fixture format: 4-byte magic "GRF0" + payload; "decode"
    * expands payload bytes into width*height floats by cyclic indexing —
    * deterministic, shape-correct, and cheap. Replace `decode`/`encode` with
    * a real codec (e.g. TwelveMonkeys/JavaCV) to productionize. */
  object StubCodec {
    val Magic: Array[Byte] = "GRF0".getBytes("UTF-8")

    def encode(pixels: Array[Float], width: Int, height: Int): Array[Byte] = {
      val payload = new Array[Byte](Magic.length + pixels.length)
      System.arraycopy(Magic, 0, payload, 0, Magic.length)
      var i = 0
      while (i < pixels.length) {
        payload(Magic.length + i) = (pixels(i).toInt & 0xff).toByte
        i += 1
      }
      payload
    }

    /** ??? in spirit — NOT a real image decoder. */
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
      require(bytes.length >= Magic.length && bytes.take(4).sameElements(Magic),
        "bad magic: not a GRF0 fixture payload")
      val n = width * height
      val out = new Array[Float](n)
      val body = bytes.length - Magic.length
      var i = 0
      while (i < n) {
        out(i) = (bytes(Magic.length + (i % body)) & 0xff).toFloat
        i += 1
      }
      out
    }
  }

  /** Decode stage: partition-preserving, batch-shaped like mapInPandas —
    * one closure invocation per partition iterator, pipelined. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").as[MediaRecord]
      .mapPartitions { it =>
        it.map { m =>
          DecodedImage(m.mediaId, m.width, m.height,
            StubCodec.decode(m.bytes, m.width, m.height))
        }
      }
  }

  /** Feature extraction over decoded pixels. */
  def imageFeatures(decoded: Dataset[DecodedImage]): Dataset[ImageFeatures] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val n = d.pixels.length
        var sum = 0.0; var mx = Float.MinValue; var nz = 0
        var i = 0
        while (i < n) {
          val v = d.pixels(i)
          sum += v; if (v > mx) mx = v; if (v != 0f) nz += 1
          i += 1
        }
        ImageFeatures(d.mediaId, if (n == 0) 0.0 else sum / n, mx.toDouble,
          if (n == 0) 0.0 else nz.toDouble / n)
      }
    }
  }

  /** Nearest-neighbor resize — pure array math on the decoded form. */
  def resize(decoded: Dataset[DecodedImage], newW: Int, newH: Int): Dataset[DecodedImage] = {
    import decoded.sparkSession.implicits._
    decoded.mapPartitions { it =>
      it.map { d =>
        val out = new Array[Float](newW * newH)
        var y = 0
        while (y < newH) {
          val sy = math.min(d.height - 1, y * d.height / newH)
          var x = 0
          while (x < newW) {
            val sx = math.min(d.width - 1, x * d.width / newW)
            out(y * newW + x) = d.pixels(sy * d.width + sx)
            x += 1
          }
          y += 1
        }
        DecodedImage(d.mediaId, newW, newH, out)
      }
    }
  }

  /** Frame sampling for video payloads: every k-th frame index, metadata
    * only (decode happens downstream per selected frame). */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("nFrames") - 1, lit(everyK))))

  /** Scale posture: media tables are partitioned/bucketed by mediaId so
    * decode stages are embarrassingly parallel and co-partitioned with any
    * per-media joins; payload bytes stay columnar in parquet (binary) and
    * are pruned away by any query touching only metadata. */
  def repartitionForDecode(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions, col("mediaId"))
}
