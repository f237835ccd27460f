package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Round trips of the LZ4 / bitshuffle filter decoders against streams
  * built with the REAL jpountz compressor (not the fixtures' literal-only
  * blocks), covering compressed blocks, the raw-fallback path, and the
  * bitshuffle block / sub-block / raw-tail rules. */
class Hdf5FilterSpec extends AnyFunSuite {

  private val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()

  private def lz4Stream(data: Array[Byte], blockSize: Int): Array[Byte] = {
    val comp = factory.fastCompressor()
    val out = java.nio.ByteBuffer.allocate(16 + data.length * 2 + 1024)
      .order(ByteOrder.BIG_ENDIAN)
    out.putLong(data.length.toLong).putInt(blockSize)
    var off = 0
    while (off < data.length) {
      val n = math.min(blockSize, data.length - off)
      val packed = comp.compress(data, off, n)
      if (packed.length >= n) { // incompressible: filter stores it raw
        out.putInt(n).put(data, off, n)
      } else {
        out.putInt(packed.length).put(packed)
      }
      off += n
    }
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  // mirror of the forward bitshuffle transform (same layout the decoder
  // and the Python fixture writer implement)
  private def shuffleBlock(data: Array[Byte], elemSize: Int): Array[Byte] = {
    val n = data.length / elemSize
    val packs = n / 8
    val out = new Array[Byte](data.length)
    for (j <- 0 until elemSize; b <- 0 until 8; k <- 0 until packs) {
      var v = 0
      for (i <- 0 until 8)
        if (((data((8 * k + i) * elemSize + j) >> b) & 1) != 0) v |= 1 << i
      out((j * 8 + b) * packs + k) = v.toByte
    }
    out
  }

  private def bitshuffleLz4Stream(
      data: Array[Byte], elemSize: Int, blockElems: Int): Array[Byte] = {
    val comp = factory.fastCompressor()
    val n = data.length / elemSize
    val out = ByteBuffer.allocate(16 + data.length * 2 + 1024)
      .order(ByteOrder.BIG_ENDIAN)
    out.putLong(data.length.toLong).putInt(blockElems * elemSize)
    var pos = 0
    def emit(nElems: Int): Unit = {
      val raw = java.util.Arrays.copyOfRange(
        data, pos * elemSize, (pos + nElems) * elemSize)
      val packed = comp.compress(shuffleBlock(raw, elemSize))
      out.putInt(packed.length).put(packed)
      pos += nElems
    }
    while (n - pos >= blockElems) emit(blockElems)
    val sub = (n - pos) & ~7
    if (sub > 0) emit(sub)
    out.put(data, pos * elemSize, (n - pos) * elemSize)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  private def pattern(len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((i * 31 + i / 7) % 251).toByte)

  private def repetitive(len: Int): Array[Byte] =
    Array.tabulate(len)(i => (i % 9).toByte) // compresses well

  test("lz4 filter: compressed multi-block stream round-trips") {
    val data = repetitive(1000)
    assert(Hdf5.lz4Defilter(lz4Stream(data, 256), 1000).toSeq == data.toSeq)
  }

  test("lz4 filter: incompressible blocks take the raw-fallback path") {
    val rnd = new java.util.Random(42)
    val data = new Array[Byte](777)
    rnd.nextBytes(data)
    val stream = lz4Stream(data, 256)
    assert(Hdf5.lz4Defilter(stream, 777).toSeq == data.toSeq)
  }

  test("lz4 filter: total-size mismatch fails loudly") {
    val data = repetitive(100)
    intercept[IllegalArgumentException] {
      Hdf5.lz4Defilter(lz4Stream(data, 64), 101)
    }
  }

  test("bitshuffle+lz4: full blocks, sub-block, and raw tail round-trip") {
    // 4-byte elements: 100 elems = 2 full 40-elem blocks + 16-elem
    // sub-block + 4-elem raw tail
    for ((nElems, blockElems) <- Seq((100, 40), (64, 8), (24, 24), (7, 8))) {
      val data = pattern(nElems * 4)
      val stream = bitshuffleLz4Stream(data, 4, blockElems)
      val out = Hdf5.bitshuffleDefilter(stream, data.length, 4, 0, lz4 = true)
      assert(out.toSeq == data.toSeq, s"nElems=$nElems block=$blockElems")
    }
  }

  test("bitshuffle raw variant round-trips with cd-values block size") {
    val data = pattern(30 * 4)
    val n = 30
    val blockElems = 8
    val out = ByteBuffer.allocate(data.length)
    var pos = 0
    while (n - pos >= blockElems) {
      out.put(shuffleBlock(java.util.Arrays.copyOfRange(
        data, pos * 4, (pos + blockElems) * 4), 4))
      pos += blockElems
    }
    val sub = (n - pos) & ~7
    if (sub > 0) {
      out.put(shuffleBlock(java.util.Arrays.copyOfRange(
        data, pos * 4, (pos + sub) * 4), 4))
      pos += sub
    }
    out.put(data, pos * 4, (n - pos) * 4)
    val decoded = Hdf5.bitshuffleDefilter(out.array(), data.length, 4,
      blockElems, lz4 = false)
    assert(decoded.toSeq == data.toSeq)
  }

  test("bitshuffle rejects non-multiple-of-8 block sizes loudly") {
    val data = pattern(48)
    val bad = ByteBuffer.allocate(64).order(ByteOrder.BIG_ENDIAN)
    bad.putLong(48L).putInt(12 * 4) // 12 elements per block: not a multiple of 8
    intercept[IllegalArgumentException] {
      Hdf5.bitshuffleDefilter(
        java.util.Arrays.copyOf(bad.array(), bad.position()), 48, 4, 0, lz4 = true)
    }
    intercept[IllegalArgumentException] {
      Hdf5.bitshuffleDefilter(data, 48, 4, 12, lz4 = false)
    }
  }
}
