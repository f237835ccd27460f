package graft.probe

import java.nio.file.{Files, Paths}

import graft.sources.Hdf5

/** Offline heavy-mutation sweep over HDF5 fixtures — the big sibling of
  * Hdf5Spec's committed 700-mutation families (which stay small to keep
  * `sbt test` fast). Earlier offline sweeps at this scale drove the
  * allocation guards in decodeArrayF64 / compoundChildren / readChunkedV4
  * / parseSelection; run it whenever a new structure family (and fixture)
  * lands — round 11: the revised-reference objref2 family.
  *
  * Contract checked: every mutated read either finishes or throws a clean
  * exception — no hang (wall-clock ceiling per read), no Error-class
  * blowup (OOM/SO). Prints an exception-class histogram so a new
  * dominant failure mode is visible at a glance.
  *
  * Run: sbt "Test/runMain graft.probe.Hdf5FuzzProbe <fixture.h5>... [nMut]"
  *      (fixtures resolve against src/test/resources/h5/)
  */
object Hdf5FuzzProbe {

  def main(args: Array[String]): Unit = {
    val (files, n) = args.partition(a => !a.forall(_.isDigit)) match {
      case (fs, ns) =>
        (if (fs.isEmpty) Seq("objref2.h5", "bad_objref2_ext.h5",
          "bad_objref2_token.h5", "bad_objref2_region.h5")
         else fs.toSeq,
         ns.headOption.map(_.toInt).getOrElse(20000))
    }
    val maxMillisPerRead = 5000L
    for (name <- files) {
      val full = Files.readAllBytes(
        Paths.get(s"src/test/resources/h5/$name"))
      val hist = scala.collection.mutable.Map.empty[String, Int]
      var slowest = 0L
      val rnd = new scala.util.Random(1142)
      var i = 0
      while (i < n) {
        val bytes = full.clone()
        // mix single-byte flips with 4/8-byte field corruption, 1/3
        // biased into the first 512 bytes (superblock/root density) —
        // the committed families' recipe at ~30x the volume
        val span = i % 3 match { case 0 => 1; case 1 => 4; case _ => 8 }
        val at = if (i % 3 == 0 && bytes.length > 512 + span)
          rnd.nextInt(512) else rnd.nextInt(math.max(1, bytes.length - span))
        var k = 0
        while (k < span) {
          bytes(at + k) = (bytes(at + k) ^ (1 + rnd.nextInt(255))).toByte
          k += 1
        }
        val t0 = System.nanoTime()
        val outcome =
          try { Hdf5.read(bytes); "ok" }
          catch { case e: Exception => e.getClass.getSimpleName }
        // Error-class throwables (OOM, StackOverflow) are NOT caught:
        // they fail the probe loudly, which is the point
        val ms = (System.nanoTime() - t0) / 1000000
        slowest = math.max(slowest, ms)
        require(ms <= maxMillisPerRead,
          s"$name mutation $i took $ms ms — possible hang/pathological path")
        hist(outcome) = hist.getOrElse(outcome, 0) + 1
        i += 1
      }
      println(s"$name: $n mutations, slowest ${slowest} ms")
      hist.toSeq.sortBy(-_._2).foreach { case (c, m) =>
        println(f"  $m%7d  $c")
      }
    }
  }
}
