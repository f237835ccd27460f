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
}
