package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot writes are partitioned by ymd/batch and prune on read") {
    val out = Files.createTempDirectory("snap").toString
    val df = Seq(("20240115", 1, 10.0), ("20240116", 2, 20.0))
      .toDF("ymd", "batch", "v")
    Sinks.writeSnapshot(df, out)
    val read = spark.read.parquet(out).filter($"ymd" === "20240115")
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ymd"), plan.take(800))
  }

  test("csv append accumulates rows across writes (S13)") {
    val out = Files.createTempDirectory("csv").toString
    val a = Seq(("20240115", 1, 0.7)).toDF("ymd", "batch", "transmission")
    val b = Seq(("20240115", 2, 0.8)).toDF("ymd", "batch", "transmission")
    Sinks.appendCsv(a, out)
    Sinks.appendCsv(b, out)
    assert(spark.read.option("header", "true").csv(out).count() == 2)
  }

  test("quarantine sinks failing rows and passes the rest (S15)") {
    val out = Files.createTempDirectory("quar").toString
    val df = Seq((1, true), (2, false), (3, true)).toDF("id", "ok")
    val good = Sinks.quarantine(df, col("ok"), out)
    assert(good.count() == 2)
    assert(spark.read.parquet(out).count() == 1)
  }

  test("quarantine treats a NULL gate as failing — no row may vanish") {
    val out = Files.createTempDirectory("quar_null").toString
    val df = Seq((1, Some(true)), (2, None), (3, Some(false)))
      .toDF("id", "ok")
    val good = Sinks.quarantine(df, col("ok"), out)
    assert(good.as[(Int, Option[Boolean])].collect().map(_._1).toSeq == Seq(1))
    // both the false AND the null-gated row land in the error path
    assert(spark.read.parquet(out).select("id").as[Int].collect().sorted.toSeq == Seq(2, 3))
  }

  test("shard export writes ONE file per shard dir and re-exports a " +
      "subset idempotently — untouched shards keep their files (w05)") {
    import graft.functions.TextFns
    val out = Files.createTempDirectory("shards").toString
    val nShards = 8
    val docs = (0L until 200L).map(i => (i, s"text_$i")).toDF("doc_id", "text")
    def shardCol = TextFns.md5Hash32(col("doc_id").cast("string"), seed = 4)
    Sinks.exportShards(docs, shardCol, out, nShards)
    def shardFiles(): Map[Int, Seq[String]] =
      new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
        .map { d =>
          d.getName.stripPrefix("shard=").toInt ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSeq.sorted
        }.toMap
    val first = shardFiles()
    assert(first.keySet == (0 until nShards).toSet, s"dirs: ${first.keySet}")
    assert(first.values.forall(_.size == 1),
      s"one file per shard expected: ${first.view.mapValues(_.size).toMap}")
    // full corpus present, shard recomputable from the id (read-side check
    // of the deterministic assignment)
    val read = spark.read.parquet(out)
    assert(read.count() == 200)
    assert(read.filter(col("shard") =!=
      pmod(TextFns.md5Hash32(col("doc_id").cast("string"), seed = 4),
        lit(nShards.toLong))).count() == 0)
    // subset re-export: only the subset's shard dirs change; the others
    // keep their EXACT files (dynamic partition overwrite). The delta is
    // carved BY shard (the incremental-repair shape: re-export shards 0
    // and 1) so it provably misses the other six dirs.
    val deltaShards = Set(0, 1)
    val inDelta = pmod(TextFns.md5Hash32(col("doc_id").cast("string"), seed = 4),
      lit(nShards.toLong)).isin(deltaShards.toSeq.map(_.toLong): _*)
    // only the first half of each re-exported shard's docs, so the
    // overwrite (not append) semantics are observable below
    val delta = docs.filter(inDelta && col("doc_id") < 100L)
    val nDelta = delta.count()
    assert(nDelta > 0)
    Sinks.exportShards(delta, shardCol, out, nShards)
    val second = shardFiles()
    assert(second.keySet == (0 until nShards).toSet,
      "untouched shard dirs must survive a subset re-export")
    for (sh <- 0 until nShards if !deltaShards.contains(sh))
      assert(second(sh) == first(sh), s"shard $sh was rewritten by a delta " +
        "that contains none of its documents")
    // rows outside the delta in overwritten shards are gone (overwrite,
    // not append): total = untouched shards' rows + delta rows
    val untouchedRows = 200L - docs.filter(inDelta).count()
    assert(spark.read.parquet(out).count() == untouchedRows + nDelta)
  }
}
