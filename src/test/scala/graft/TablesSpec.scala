package graft

/** Pins the round-21 Tables behavior: the per-session DataFrame memo (plan
  * reuse, never data reuse) and loadSpread's conditional repartition — the
  * spread shuffle exists ONLY while the scan is under-split, so at real
  * scale (many splits) the corpus is not re-shuffled just to be loaded.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // the logical node, not the physical exchange: AQE wraps the executed
  // plan so physical collect() sees only the adaptive root pre-execution
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.size

  test("load memoizes per (session, dir, table) — same plan object, and " +
      "actions still scan parquet (values, not cached results)") {
    val a = Tables.load(spark, sf, "nation")
    val b = Tables.load(spark, sf, "nation")
    assert(a eq b, "repeat loads must return the memoized DataFrame")
    // different dir or table -> different entry
    assert(!(Tables.load(spark, sf, "region") eq a))
    // the plan is a live parquet scan, not a materialized result
    assert(a.queryExecution.executedPlan.toString.contains("FileScan parquet"))
    assert(a.count() > 0)
  }

  test("loadSpread repartitions an under-split scan up to defaultParallelism") {
    val df = Tables.loadSpread(spark, sf, "documents") // single file, 1 split
    assert(shuffles(df) == 1, "under-split scan must gain the spread shuffle")
    assert(df.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // memoized too
    assert(Tables.loadSpread(spark, sf, "documents") eq df)
  }

  test("loadSpread adds NO shuffle when the scan already has enough splits " +
      "(the 100 TB posture: never re-shuffle a corpus just to load it)") {
    // build a table dir with >= defaultParallelism files, and size the
    // split confs so each tiny file is its own split (default 4 MB
    // openCost bin-packs them all into one)
    val dir = java.nio.file.Files.createTempDirectory("graft_spread").toString
    val n = spark.sparkContext.defaultParallelism
    (0 until n).map(i => (i.toLong, s"doc $i text"))
      .toDF("doc_id", "text")
      .repartition(n)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64")
    try {
      val df = Tables.loadSpread(spark, dir, "documents")
      assert(df.rdd.getNumPartitions >= n)
      assert(shuffles(df) == 0,
        "a well-split scan must come back without a repartition node")
    } finally {
      spark.conf.unset("spark.sql.files.openCostInBytes")
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("data-model invariant: documents.source is never null (t14's " +
      "shared isnotnull(source) filter is value-identical ONLY under " +
      "this invariant — r21 VERDICT asked for a contract, not a comment)") {
    import org.apache.spark.sql.functions.col
    for (sfd <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val n = Tables.load(spark, sfd, "documents")
        .filter(col("source").isNull).count()
      assert(n == 0, s"$sfd has $n null documents.source rows — t14's " +
        "pre-filter would change the corpus marginal on this data")
    }
  }
}
