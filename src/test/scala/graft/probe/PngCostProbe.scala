package graft.probe

import graft.multimodal.Multimodal.ImageCodec

/** Round-21 evidence for ImageCodec's `ImageIO.setUseCache(false)`:
  * ImageIO's default stream cache spools every encode/decode through a
  * temp file on disk — two file creations per round trip for 64-byte
  * thumbnails. Measured on this container: 15k round trips 4.46 s with
  * the file cache vs 0.60 s with the memory cache (7.4×), identical
  * bytes. ImageCodec now disables the file cache at init; this probe
  * re-creates the old behavior explicitly for the A side.
  *
  * Run: sbt "Test/runMain graft.probe.PngCostProbe"
  */
object PngCostProbe {
  def main(args: Array[String]): Unit = {
    def bench(label: String): Unit = {
      val px = Array.tabulate(64)(k => ((k * 7) % 256).toFloat)
      (0 until 2000).foreach { _ => ImageCodec.decode(ImageCodec.encodePng(px, 8, 8)) }
      val t0 = System.nanoTime()
      var i = 0
      while (i < 15000) { ImageCodec.decode(ImageCodec.encodePng(px, 8, 8)); i += 1 }
      println(f"[png] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s for 15000 roundtrips")
    }
    javax.imageio.ImageIO.setUseCache(true) // the pre-r21 default
    bench("useCache=true (pre-r21 default)")
    javax.imageio.ImageIO.setUseCache(false) // what ImageCodec init now sets
    bench("useCache=false (shipped)")
  }
}
