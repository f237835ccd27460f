package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[ZOrder]] — key arithmetic against a reference interleave, and the
  * measured file-pruning claim: range-partitioning a table by the Morton
  * key makes BOTH dimensions' per-file min/max stats selective, where a
  * single-column sort leaves the other dimension unprunable.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches the reference bit-sum on boundary and random " +
      "values, stays non-negative, and is monotone under box nesting") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (123456789L, 987654321L), (0x55555555L, 0x2AAAAAAAL),
      // values past 31 bits must be masked, not corrupt the key
      (0xFFFFFFFFL, 0x100000000L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    for (((a, b), z) <- cases.zip(got)) {
      assert(z == ref(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"($a, $b)")
      assert(z >= 0L, s"negative key for ($a, $b)")
    }
  }

  test("file pruning, measured: after range-partitioning by z, a filter " +
      "on EITHER dimension overlaps a fraction of the files; a linear " +
      "sort on a leaves a b-filter scanning every file") {
    val nFiles = 16
    val grid = spark.range(0, 256L * 256L)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val aDir = java.nio.file.Files.createTempDirectory("linear").toString
    // repartitionByRange picks boundaries from a 100-rows-per-partition
    // reservoir sample whose seed varies with RDD id (suite order) — under
    // full-suite parallel load a skewed sample can leave a near-empty
    // partition (fewer files) or smear a boundary file across the b-range
    // knife edge. A 20x sample makes the quantiles effectively exact for
    // this 65,536-row grid; scoped set/reset (a larger sample is only ever
    // more precise, so a concurrent suite reading it mid-test is unharmed).
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "2000")
    try {
      grid.repartitionByRange(nFiles, ZOrder.interleave(col("a"), col("b")))
        .write.mode("overwrite").parquet(zDir)
      grid.repartitionByRange(nFiles, col("a"))
        .write.mode("overwrite").parquet(aDir)
    } finally {
      prevSample match {
        case Some(v) => spark.conf.set(sampleKey, v)
        case None => spark.conf.unset(sampleKey)
      }
    }

    // per-file (min, max) of each dimension, read back footer-equivalent
    def fileSpans(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("a"), max("a"), min("b"), max("b")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    val zSpans = fileSpans(zDir)
    val aSpans = fileSpans(aDir)
    // tolerate one empty range partition (no file) — the claim under test
    // is pruning fractions, not the writer's exact file count
    assert(zSpans.size >= nFiles - 1 && aSpans.size >= nFiles - 1,
      s"z=${zSpans.size}, a=${aSpans.size} files of $nFiles partitions")

    // how many files could contain rows with dim ∈ [lo, hi]?
    def overlapA(spans: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long) =
      spans.count { case (mn, mx, _, _) => mx >= lo && mn <= hi }
    def overlapB(spans: Seq[(Long, Long, Long, Long)], lo: Long, hi: Long) =
      spans.count { case (_, _, mn, mx) => mx >= lo && mn <= hi }

    // b-filter: the linear-by-a layout cannot prune AT ALL (every file
    // spans all of b); the z layout confines b to a strict subset.
    // Denominators are the ACTUAL file counts so a missing empty
    // partition can't shift the fractions. With near-exact boundaries
    // the z-side expectation is ~6/16 on b (qualifying keys live in
    // z ∈ [10272, 32253] = files 2..7), well under the half bound.
    val zB = overlapB(zSpans, 100, 110)
    val aB = overlapB(aSpans, 100, 110)
    assert(aB == aSpans.size, s"linear layout should span b everywhere: $aB")
    assert(zB <= zSpans.size / 2, s"z layout pruned only to $zB/${zSpans.size} files")
    // a-filter: the z layout still prunes (both dims share the key's bits)
    val zA = overlapA(zSpans, 100, 110)
    assert(zA <= zSpans.size / 2, s"z layout pruned only to $zA/${zSpans.size} on a")
  }
}
