package graft.sources

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Hdf5.{AllSel, MultiBlockSel, PointSel, Sel, Slab,
  SlabSel, StridedSel, copySpans, dimStrides, slabSpans}

/** Brute-force property checks for the selection span machinery — an
  * INDEPENDENT oracle from the fixture encodings: every selection's span
  * stream must enumerate exactly the coordinates a naive nested-loop
  * enumeration produces, in the same row-major order. The round-7
  * interleave bug (parser and fixture sharing one wrong assumption) is
  * the class of failure this spec exists to catch.
  */
class SelectionSpansSpec extends AnyFunSuite {

  /** Flatten a span stream to per-element offsets. */
  private def elems(spans: Iterator[(Long, Long)]): Seq[Long] =
    spans.flatMap { case (off, len) => off until (off + len) }.toSeq

  /** Naive oracle: row-major offsets of a slab via nested coordinate
    * loops (no shared code with slabSpans/slabOffset). */
  private def bruteSlab(slab: Slab, dims: Seq[Long]): Seq[Long] = {
    val strd = dimStrides(dims)
    def loop(d: Int, base: Long): Seq[Long] =
      if (d == dims.length) Seq(base)
      else (0L until slab.count(d)).flatMap(c =>
        loop(d + 1, base + (slab.start(d) + c) * strd(d)))
    loop(0, 0L)
  }

  /** Naive oracle for a regular hyperslab: ascending selected coordinates
    * per dim (count blocks of block elements at stride), row-major
    * cartesian product. */
  private def bruteRegular(start: Seq[Long], stride: Seq[Long],
      count: Seq[Long], block: Seq[Long], dims: Seq[Long]): Seq[Long] = {
    val strd = dimStrides(dims)
    val coords: Seq[Seq[Long]] = start.indices.map { d =>
      for {
        i <- 0L until count(d)
        j <- 0L until block(d)
      } yield start(d) + i * stride(d) + j
    }
    def loop(d: Int, base: Long): Seq[Long] =
      if (d == dims.length) Seq(base)
      else coords(d).flatMap(c => loop(d + 1, base + c * strd(d)))
    loop(0, 0L)
  }

  private val rnd = new Random(0x5eed)

  test("slabSpans matches the nested-loop oracle on random slabs") {
    for (_ <- 1 to 200) {
      val rank = 1 + rnd.nextInt(3)
      val dims = Seq.fill(rank)(1L + rnd.nextInt(6))
      val start = dims.map(d => rnd.nextInt(d.toInt).toLong)
      val count = dims.zip(start).map { case (d, s) =>
        1L + rnd.nextInt((d - s).toInt) }
      val slab = Slab(start, count)
      assert(elems(slabSpans(slab, dims)) == bruteSlab(slab, dims),
        s"dims=$dims slab=$slab")
    }
  }

  test("StridedSel.spans matches the regular-hyperslab oracle") {
    for (_ <- 1 to 200) {
      val rank = 1 + rnd.nextInt(3)
      val block = Seq.fill(rank)(1L + rnd.nextInt(3))
      val stride = block.map(b => b + rnd.nextInt(3))
      val count = Seq.fill(rank)(1L + rnd.nextInt(3))
      val start = Seq.fill(rank)(rnd.nextInt(3).toLong)
      val dims = start.indices.map(d =>
        start(d) + (count(d) - 1) * stride(d) + block(d) + rnd.nextInt(3))
      val sel = StridedSel(start, stride, count, block)
      sel.validate(dims, "test")
      assert(sel.numElems(dims) == count.zip(block).map { case (c, b) => c * b }.product)
      assert(elems(sel.spans(dims)) ==
        bruteRegular(start, stride, count, block, dims),
        s"dims=$dims sel=$sel")
    }
  }

  test("MultiBlockSel.spans merges disjoint random blocks to ascending " +
      "row-major order") {
    for (_ <- 1 to 100) {
      // carve [8, W] into disjoint single-row-range boxes with random col
      // ranges, shuffle their stored order
      val w = 2L + rnd.nextInt(4)
      val blocks = (0 until 8).flatMap { r =>
        if (rnd.nextBoolean()) {
          val c0 = rnd.nextInt(w.toInt).toLong
          val c1 = c0 + rnd.nextInt((w - c0).toInt)
          Some(Slab(Seq(r.toLong, c0), Seq(1L, c1 - c0 + 1)))
        } else None
      }
      if (blocks.size > 1) {
        val dims = Seq(8L, w)
        val sel = MultiBlockSel(rnd.shuffle(blocks))
        val expected = blocks.flatMap(bruteSlab(_, dims)).sorted
        assert(elems(sel.spans(dims)) == expected, s"dims=$dims sel=$sel")
      }
    }
  }

  test("MultiBlockSel rejects overlapping blocks during validate") {
    val sel = MultiBlockSel(Seq(
      Slab(Seq(0L, 0L), Seq(2L, 2L)), Slab(Seq(1L, 1L), Seq(2L, 2L))))
    val e = intercept[IllegalArgumentException] {
      sel.validate(Seq(4L, 4L), "virtual extent")
    }
    assert(e.getMessage.contains("virtual extent") &&
      e.getMessage.contains("overlapping"))
  }

  test("copySpans is a faithful element-order graft between any two " +
      "equal-count selections") {
    for (_ <- 1 to 100) {
      val srcDims = Seq(2L + rnd.nextInt(3), 2L + rnd.nextInt(3))
      val n = srcDims.product.toInt
      // destination: a random slab with exactly n elements in a padded grid
      val dstRows = 1 + rnd.nextInt(n)
      if (n % dstRows == 0) {
        val dstDims = Seq(dstRows + 1L, (n / dstRows) + 2L)
        val dst = Slab(Seq(0L, 1L), Seq(dstRows.toLong, (n / dstRows).toLong))
        val src = Array.tabulate[Byte](n)(i => (i + 1).toByte)
        val out = new Array[Byte]((dstDims.product).toInt)
        copySpans(src, (AllSel: Sel).spans(srcDims), out,
          slabSpans(dst, dstDims), 1)
        // read back along the destination slab: must be 1..n in order
        val got = elems(slabSpans(dst, dstDims)).map(off => out(off.toInt))
        assert(got == (1 to n).map(_.toByte), s"src=$srcDims dst=$dst")
        // untouched cells keep zero
        assert(out.map(_.toInt).sum == (1 to n).sum)
      }
    }
  }

  test("UnlimSel clamps to whole blocks of the given extent") {
    val u = Hdf5.UnlimSel(Seq(0L, 0L), Seq(2L, 3L), 0)
    // [7,3]: three whole 2-row blocks fit, the 7th row does not
    assert(u.maxBlocks(Seq(7L, 3L)) == 3L)
    assert(u.numElems(Seq(7L, 3L)) == 18L)
    assert(elems(u.spans(Seq(7L, 3L))) == (0L until 18L))
    // k-th block slab sits k*blockRows down
    assert(u.blockSlab(2) == Slab(Seq(4L, 0L), Seq(2L, 3L)))
    // start offset shrinks the usable extent
    assert(Hdf5.UnlimSel(Seq(1L, 0L), Seq(2L, 3L), 0).maxBlocks(Seq(7L, 3L)) == 3L)
    assert(Hdf5.UnlimSel(Seq(2L, 0L), Seq(2L, 3L), 0).maxBlocks(Seq(5L, 3L)) == 1L)
  }

  test("PointSel preserves stored point order, not offset order") {
    val pts = Seq(Seq(3L, 1L), Seq(0L, 2L), Seq(1L, 0L))
    val sel = PointSel(pts)
    assert(elems(sel.spans(Seq(4L, 3L))) == Seq(10L, 2L, 3L))
  }

  test("unshuffle inverts an independently written byte transpose") {
    // the tail is the sub-element REMAINDER, always < esz
    for (esz <- Seq(1, 2, 4, 8, 3); tail <- 0 until math.min(esz, 3)) {
      val n = 1 + rnd.nextInt(50)
      val data = Array.fill[Byte](n * esz + tail)(rnd.nextInt(256).toByte)
      // naive forward shuffle, written here (not shared with the reader):
      // plane j collects byte j of every whole element; tail stays put
      val shuffled = new Array[Byte](data.length)
      var k = 0
      for (j <- 0 until esz; i <- 0 until n) {
        shuffled(k) = data(i * esz + j); k += 1
      }
      System.arraycopy(data, n * esz, shuffled, n * esz, tail)
      assert(Hdf5.unshuffle(shuffled, esz).toSeq == data.toSeq,
        s"esz=$esz n=$n tail=$tail")
    }
  }

  test("fletcher32 matches an independent per-word-fold implementation") {
    // H5checksum's own unit anchors first
    assert(Hdf5.fletcher32(Array.emptyByteArray) == 0L)
    assert(Hdf5.fletcher32(Array(0xAB.toByte)) == 0xAB00AB00L)
    assert(Hdf5.fletcher32(Array[Byte](1, 2)) == 0x01020102L)
    // independent oracle: fold after EVERY word instead of HDF5's
    // 360-word overflow blocks — a broken block fold cannot agree with
    // this on multi-block (>720-byte) buffers
    def slow(data: Array[Byte]): Long = {
      def fold(x: Long): Long = (x & 0xFFFF) + (x >> 16)
      var s1 = 0L
      var s2 = 0L
      for (k <- 0 until data.length / 2) {
        s1 = fold(s1 + ((((data(2 * k) & 0xFF) << 8) | (data(2 * k + 1) & 0xFF)).toLong))
        s2 = fold(s2 + s1)
      }
      if (data.length % 2 == 1) {
        s1 = fold(s1 + ((data.last & 0xFF).toLong << 8))
        s2 = fold(s2 + s1)
      }
      ((fold(s2) & 0xFFFF) << 16) | (fold(s1) & 0xFFFF)
    }
    for (len <- Seq(2, 719, 720, 721, 1441, 100000, 100001)) {
      val data = Array.fill[Byte](len)(rnd.nextInt(256).toByte)
      assert(Hdf5.fletcher32(data) == slow(data), s"len=$len")
    }
  }
}
