package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles with linear interpolation — the same
  * semantics as Spark's `percentile()` aggregate and DuckDB's
  * `quantile_cont` (target index `p * (n-1)`, result
  * `v_lo + (v_hi - v_lo) * frac` in that exact floating-point order) —
  * computed WITHOUT the value→count hash map `percentile()` buffers per
  * group. That buffer is proportional to the number of DISTINCT values:
  * fine for small-domain columns, an executor-memory hazard on continuous
  * doubles at 100 TB where distinct ≈ row count.
  *
  * Shape: two-phase exact-rank selection, the same pattern as the w04/w07
  * prefix sums —
  *
  *  1. chunk each group by coarse value range (`chunk = floor(v / span)`,
  *     monotone in v, so chunk order == value order);
  *  2. aggregate per-(group, chunk) row counts into a tiny spine and
  *     cumulate EXCLUSIVE offsets over it, so `offset + local_rank` is
  *     the exact global rank of a row within its group's value order;
  *  3. compute every percentile's bracketing ranks (lo = floor(idx)+1,
  *     hi = ceil(idx)+1, 1-based) from the per-group totals, and PRUNE:
  *     only chunks whose `[offset, offset+count)` rank range contains a
  *     needed rank survive — the heavy per-(group, chunk) sort+window
  *     runs over ~(#percentiles × chunk) rows, never the corpus (the
  *     w07 budget-prune idea applied to ranks);
  *  4. pick the values at the bracketing ranks and interpolate.
  *
  * Ties need no special order: equal values share a chunk, and whatever
  * order `row_number` gives them, the VALUE at each rank is the same.
  * Null values are excluded, matching `percentile()`.
  *
  * The value span auto-sizes from a 1-row global min/max prefetch
  * (parquet-stats cheap, the q39/w04 justified pattern) to target ~4
  * chunks per core; `spanOverride` pins it for tests.
  */
object ExactPercentile {

  /** df → one row per group: `grpName`, then one named column per
    * requested percentile. `ps` maps output column name → p in [0, 1].
    */
  def of(df: DataFrame, grpName: String, valCol: Column,
         ps: Seq[(String, Double)],
         spanOverride: Option[Double] = None): DataFrame = {
    require(ps.nonEmpty, "ExactPercentile.of needs at least one percentile")
    require(ps.map(_._1).distinct.size == ps.size,
      s"duplicate percentile output names in ${ps.map(_._1)} — the pivot " +
        "would silently collapse them into one column")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentile $n=$p outside [0, 1]")
    }
    // the group key travels wrapped in a 1-field struct: a null GROUP KEY
    // is a real percentile() group, but bare null keys never match in the
    // equi-joins below — struct-wrapped nulls do
    val base = df.select(struct(col(grpName)).as("g"),
        valCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val span = spanOverride.getOrElse {
      val r = base.agg(min(col("v")), max(col("v"))).head()
      if (r.isNullAt(0)) 1.0
      else {
        // the floor scales with the value MAGNITUDE, not a constant:
        // a constant (min==max) or near-constant column with |v|~1e10
        // against a 1e-9 floor would make chunk = floor(v/span) overflow
        // Long (ANSI throw); |v|·1e-12 bounds chunk ids at ~1e12 while
        // staying far finer than any useful chunking
        val absMax = math.max(math.abs(r.getDouble(0)), math.abs(r.getDouble(1)))
        math.max((r.getDouble(1) - r.getDouble(0)) /
          (df.sparkSession.sparkContext.defaultParallelism.toDouble * 4),
          math.max(1e-9, absMax * 1e-12))
      }
    }
    require(span > 0, s"ExactPercentile span must be > 0: got $span")
    val chunked = base.withColumn("chunk", floor(col("v") / span).cast("long"))

    // spine: one row per (group, chunk) with its EXCLUSIVE rank offset
    val wSpine = Window.partitionBy(col("g")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = chunked.groupBy(col("g"), col("chunk"))
      .agg(count(lit(1)).as("c"))
      .withColumn("offset", coalesce(sum(col("c")).over(wSpine), lit(0L)))

    // per-group totals -> every percentile's bracketing ranks (1-based).
    // idx = p*(n-1); when frac == 0 both brackets collapse to the same
    // rank and the interpolation term vanishes exactly.
    val totals = spine.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val targets = totals.select(col("g"), col("n"),
      explode(array(ps.map { case (name, p) =>
        val idx = lit(p) * (col("n") - 1).cast("double")
        // weights in percentile()'s EXACT floating-point form —
        // (ceil(idx) - idx) and (idx - floor(idx)), never the
        // 1-frac/frac rewrite, which differs in the last ulp
        struct(lit(name).as("pname"),
          (floor(idx).cast("long") + 1).as("lo"),
          least(ceil(idx).cast("long") + 1, col("n")).as("hi"),
          (ceil(idx) - idx).as("wlo"),
          (idx - floor(idx)).as("whi"))
      }: _*)).as("t"))
      .select(col("g"), col("t.pname"), col("t.lo"), col("t.hi"),
        col("t.wlo"), col("t.whi"))

    // rank prune: a chunk survives only if its [offset, offset+c) rank
    // range contains some percentile's lo or hi — a tiny frame (groups x
    // percentiles x 2 rank probes against the spine) that AQE broadcasts
    val needed = spine.join(targets, Seq("g"))
      .filter((col("lo") > col("offset") && col("lo") <= col("offset") + col("c")) ||
        (col("hi") > col("offset") && col("hi") <= col("offset") + col("c")))
      .select(col("g"), col("chunk"), col("offset")).distinct()

    // heavy window over SURVIVING chunks only; global rank is exact
    val wLocal = Window.partitionBy(col("g"), col("chunk")).orderBy(col("v"))
    val ranked = chunked.join(needed, Seq("g", "chunk"))
      .withColumn("rank", col("offset") + row_number().over(wLocal))

    // bracket values + interpolation in percentile()'s exact FP order:
    // (ceil(idx) - idx) * v_lo + (idx - floor(idx)) * v_hi, collapsing
    // to v_lo when the index is integral
    val picked = ranked.join(targets, Seq("g"))
      .filter(col("rank") === col("lo") || col("rank") === col("hi"))
      .groupBy(col("g"), col("pname"), col("wlo"), col("whi"))
      .agg(min(when(col("rank") === col("lo"), col("v"))).as("vlo"),
        min(when(col("rank") === col("hi"), col("v"))).as("vhi"))
      .withColumn("value",
        when(col("whi") === 0.0, col("vlo"))
          .otherwise(col("wlo") * col("vlo") + col("whi") * col("vhi")))
    val pivoted = picked.groupBy(col("g").as("gp"))
      .pivot("pname", ps.map(_._1))
      .agg(first(col("value")))
    // groups whose values are ALL null were filtered out of `base` above —
    // percentile()'s contract keeps the group and returns NULL, so
    // left-join the result back onto the full group set (null-safe: a
    // null GROUP KEY is itself a valid percentile() group)
    df.select(struct(col(grpName)).as("g")).distinct()
      .join(pivoted, col("g") <=> col("gp"), "left")
      .select(col("g").getField(grpName).as(grpName) +:
        ps.map { case (n, _) => col(n) }: _*)
  }
}
