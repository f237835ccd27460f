package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ExactPercentile must be VALUE-IDENTICAL to Spark's percentile()
  * aggregate (the semantics the q25 oracle gate pins against DuckDB's
  * quantile_cont) — the rewrite only changes the execution shape, never
  * the numbers. Fixtures cover the rank-selection edge cases: exact-rank
  * hits (frac = 0), heavy ties, negative values, single-row groups, and
  * groups that span many chunks vs one.
  */
class ExactPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq("p10" -> 0.1, "p25" -> 0.25, "p50" -> 0.5,
    "p90" -> 0.9, "p100" -> 1.0, "p0" -> 0.0)

  private def check(rows: Seq[(String, Double)], span: Option[Double]): Unit = {
    val df = rows.toDF("g", "v")
    val got = ExactPercentile.of(df, "g", col("v"), ps, span)
      .collect().map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1))).toMap
    val want = df.groupBy(col("g").as("gg"))
      .agg(percentile(col("v"),
        array(ps.map(p => lit(p._2)): _*)).as("pp"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).toIndexedSeq).toMap
    assert(got.keySet == want.keySet)
    for (g <- got.keySet; i <- ps.indices)
      assert(got(g)(i) == want(g)(i),
        s"group $g ${ps(i)._1}: got ${got(g)(i)}, want ${want(g)(i)} " +
          s"(span=$span)")
  }

  private val fixtures: Seq[(String, Seq[(String, Double)])] = Seq(
    "two groups, distinct values" ->
      ((1 to 37).map(i => "a" -> i * 3.5) ++
        (1 to 11).map(i => "b" -> (1000.0 - i * 7.25))),
    "heavy ties (3 distinct values)" ->
      (1 to 50).map(i => "a" -> (i % 3).toDouble),
    "negative and mixed-sign values" ->
      (1 to 29).map(i => "a" -> (i * 13 % 17 - 8.5)),
    "single-row group beside a large one" ->
      (("solo" -> 42.0) +: (1 to 40).map(i => "big" -> i / 3.0)),
    "exact-rank hits (n = 5: p25 and p50 land on integers)" ->
      (1 to 5).map(i => "a" -> i * 10.0))

  test("value-identical to percentile() across fixtures, spans forcing " +
      "many chunks, one chunk, and the auto-sized span") {
    for ((name, rows) <- fixtures;
         span <- Seq(Some(0.9), Some(1e9), None)) {
      withClue(s"$name / span=$span: ") { check(rows, span) }
    }
  }

  test("the heavy window runs over PRUNED chunks only — the plan keys the " +
      "sort by (g, chunk) and never range-partitions globally") {
    val df = (1 to 200).map(i => ("g" + i % 3) -> i * 1.37).toDF("g", "v")
    val plan = ExactPercentile.of(df, "g", col("v"), Seq("p50" -> 0.5),
      Some(5.0)).queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(g#\\d+, chunk#\\d+L".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(2000))
    // the pruning semi-structure is present: the ranked side joins the
    // `needed` chunk list before the window sees any row
    assert(plan.contains("Join"), plan.take(2000))
  }

  test("invalid inputs fail loudly") {
    val df = Seq("a" -> 1.0).toDF("g", "v")
    intercept[IllegalArgumentException](
      ExactPercentile.of(df, "g", col("v"), Nil))
    intercept[IllegalArgumentException](
      ExactPercentile.of(df, "g", col("v"), Seq("bad" -> 1.5)))
    intercept[IllegalArgumentException](
      ExactPercentile.of(df, "g", col("v"), Seq("p50" -> 0.5), Some(0.0)))
    intercept[IllegalArgumentException](
      ExactPercentile.of(df, "g", col("v"), Seq("p50" -> 0.5, "p50" -> 0.9)),
    )
  }

  test("all-null groups and null GROUP KEYS keep percentile()'s contract: " +
      "the group row survives with null percentiles / its values computed") {
    val df = Seq(
      (Some("a"), Some(1.0)), (Some("a"), Some(3.0)),
      (Some("allnull"), None), (Some("allnull"), None),
      (None, Some(10.0)), (None, Some(20.0))).toDF("g", "v")
    val got = ExactPercentile.of(df, "g", col("v"), Seq("p50" -> 0.5))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got.keySet == Set(Some("a"), Some("allnull"), None),
      "every group in df must emit exactly one row")
    assert(got(Some("a")).contains(2.0))
    assert(got(Some("allnull")).isEmpty,
      "an all-null group returns NULL, exactly like percentile()")
    assert(got(None).contains(15.0),
      "a null group key is a real group (null-safe join back)")
  }

  test("a constant column at |v|~1e10 (min==max) no longer overflows the " +
      "chunk id — the span floor scales with value magnitude") {
    val df = Seq("a" -> 9.2e10, "a" -> 9.2e10, "b" -> -9.2e10).toDF("g", "v")
    val got = ExactPercentile.of(df, "g", col("v"), Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 9.2e10, "b" -> -9.2e10))
  }
}
