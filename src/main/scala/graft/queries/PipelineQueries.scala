package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference pipeline's operator semantics (SURVEY §2) exercised over the
  * driver's test tables, so each gets a DuckDB oracle. The MOUSE domain module
  * (graft.pipeline) applies the same primitives to repetition fixtures; here
  * the semantics are proven relationally:
  *
  * - p01 stacking stats (A1/A3): mean/stddev_samp/sem/min/max per group
  * - p02 batch-max propagation + lowest-repetition gate (A7/A8/F4)
  * - p03 thickness-from-absorption math with value guards (K12/K14/F8)
  * - p04 energy-from-wavelength with guards (K11)
  * - p05 identifier/date assembly (K17/K18)
  * - p06 required-file count gate (S2/F1/A5)
  * - p07 staleness gate: newest-input vs snapshot (F5/A6)
  * - p08 ordered stack + first-as-template (A2/A4, §2.7 sorts)
  * - p09 quantity-with-units struct + fixed conversions (§1.2 pint mapping)
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A3: per-"batch" summary statistics exactly as the stacker computes
    // them (ddof=1 stddev, sem = std/sqrt(n)); groups with n >= 2 so
    // stddev_samp is defined, like stacking >= 2 repetitions.
    "p01" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("l_quantity")), 4).as("mean_qty"),
          round(stddev_samp(col("l_quantity")), 4).as("std_qty"),
          round(stddev_samp(col("l_quantity")) / sqrt(count(lit(1))), 4).as("sem_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .filter(col("n") >= 2)
    },

    // A7/A8/F4: propagate the batch max to every row of the batch and flag
    // the lowest "repetition" — pure window functions, no re-grouping.
    "p02" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-02-01")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_discount"),
          round(max(col("l_discount")).over(w), 4).as("largest_discount"),
          (col("l_linenumber") === min(col("l_linenumber")).over(w)).as("is_lowest_rep"))
    },

    // K12/K13/K14/F8: t = -sign(a) * ln(1 - |a|) / mu with the reference's
    // calculate_thickness guards (a == 0 or |a| > 1 -> sentinel -1;
    // negative a in (-1, 0) gives a small NEGATIVE thickness), and the
    // "logbook wins if >= 0" choice. l_discount is non-negative in this
    // data, so the negative branch is exercised by PipelineSpec instead.
    "p03" -> { (s, dir) =>
      val a = col("l_discount")
      val mu = col("l_tax") + lit(0.01)
      val derived = -signum(a) * log(lit(1.0) - abs(a)) / mu
      val guarded = when(abs(a) === 0 || abs(a) > 1, lit(-1.0)).otherwise(derived)
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          round(a, 4).as("absorption"),
          round(guarded, 6).as("derived_thickness"),
          round(when(col("l_quantity") >= 25, col("l_quantity"))
            .otherwise(guarded), 6).as("thickness"))
    },

    // K11: E[keV] = hc/lambda with non-positive guard (null, like the
    // reference's warn-and-skip).
    "p04" -> { (s, dir) =>
      val lam = col("l_quantity") / 10.0
      t(s, dir, "lineitem")
        .filter(col("l_linenumber") === 2 && col("l_orderkey") % 7 === 0)
        .select(col("l_orderkey"),
          round(lam, 4).as("wavelength_angstrom"),
          round(when(lam <= 0, lit(null)).otherwise(lit(12.398419843320026) / lam), 6)
            .as("energy_kev"))
    },

    // K17/K18: identifier strings (ymd_batch style) + day arithmetic.
    "p05" -> { (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyyMMdd").as("ymd"),
          concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit("_"),
            (col("o_custkey") % 100).cast("string")).as("collection_identifier"),
          format_string("%s_%d", date_format(col("o_orderdate"), "yyyyMMdd"),
            col("o_orderkey") % 7).as("background_identifier"),
          datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since_epoch"))
    },

    // S2/F1/A5: per-group conditional counts + the all-conditions-met gate
    // (the 4-file readiness predicate of checkers.py).
    "p06" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          count(when(col("l_returnflag") === "R", 1)).as("n_r"),
          count(when(col("l_returnflag") === "A", 1)).as("n_a"),
          count(when(col("l_returnflag") === "N", 1)).as("n_n"))
        .withColumn("ready", col("n_r") >= 1 && col("n_n") >= 2)
        .filter(col("ready"))
    },

    // F5/A6: staleness — emit groups whose newest input is newer than the
    // snapshot timestamp (orderdate + 100 days stands in for the stacked
    // file's mtime).
    "p07" -> { (s, dir) =>
      val newest = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("newest_input"))
      t(s, dir, "orders")
        .join(newest, col("o_orderkey") === col("l_orderkey"))
        .filter(col("newest_input") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
        .select(col("o_orderkey"), col("o_orderdate"), col("newest_input"))
    },

    // A2/A4: ordered stack (collect_list sorted by repetition) and
    // first-as-template (min_by).
    "p08" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          // Serialized (printf %.2f, comma-joined) so the driver's comparator
          // can sort/hash the column; the ordered-concat semantics (A2) are
          // unchanged. l_linenumber is NOT unique within an order in this
          // data — the composite sort key keeps tie-breaking deterministic.
          concat_ws(",", transform(
            array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))),
            x => format_string("%.2f", x.getField("l_quantity")))).as("qty_series"),
          min_by(col("l_extendedprice"),
            col("l_linenumber") * lit(1e9) + col("l_extendedprice")).as("first_price"),
          count(lit(1)).as("n"))
    },

    // §1.2: physical-quantity-with-units struct + the fixed conversions the
    // reference does with pint (mm -> m, px -> m via pixel pitch).
    "p09" -> { (s, dir) =>
      // The quantity-with-units pair is carried as (value, units) scalar
      // column pairs — flattened struct fields — so the driver's comparator
      // can hash them; graft.pipeline keeps the struct form internally.
      val mm = struct(col("l_quantity").as("value"), lit("mm").as("units"))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          mm.getField("value").as("q_mm_value"),
          mm.getField("units").as("q_mm_units"),
          round(mm.getField("value") / 1000.0, 6).as("q_m_value"),
          lit("m").as("q_m_units"),
          round(col("l_partkey") * lit(75e-6), 6).as("det_pos_m"))
    })

  val oracle: Map[String, String] = Map(
    "p01" ->
      """SELECT l_orderkey, count(1)::BIGINT AS n,
        | round(avg(l_quantity),4) AS mean_qty,
        | round(stddev_samp(l_quantity),4) AS std_qty,
        | round(stddev_samp(l_quantity)/sqrt(count(1)),4) AS sem_qty,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1 HAVING count(1) >= 2""".stripMargin,

    "p02" ->
      """SELECT l_orderkey, l_linenumber, l_discount,
        | round(max(l_discount) OVER (PARTITION BY l_orderkey),4) AS largest_discount,
        | l_linenumber = min(l_linenumber) OVER (PARTITION BY l_orderkey) AS is_lowest_rep
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin,

    "p03" ->
      """SELECT l_orderkey,
        | round(l_discount,4) AS absorption,
        | round(CASE WHEN abs(l_discount) = 0 OR abs(l_discount) > 1 THEN -1.0
        |            ELSE -sign(l_discount)*ln(1-abs(l_discount))/(l_tax+0.01) END, 6) AS derived_thickness,
        | round(CASE WHEN l_quantity >= 25 THEN l_quantity
        |            WHEN abs(l_discount) = 0 OR abs(l_discount) > 1 THEN -1.0
        |            ELSE -sign(l_discount)*ln(1-abs(l_discount))/(l_tax+0.01) END, 6) AS thickness
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,

    "p04" ->
      """SELECT l_orderkey,
        | round(l_quantity/10.0,4) AS wavelength_angstrom,
        | round(CASE WHEN l_quantity/10.0 <= 0 THEN NULL
        |            ELSE 12.398419843320026/(l_quantity/10.0) END, 6) AS energy_kev
        |FROM lineitem WHERE l_linenumber = 2 AND l_orderkey % 7 = 0""".stripMargin,

    "p05" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y%m%d') AS ymd,
        | strftime(o_orderdate, '%Y%m%d') || '_' || (o_custkey % 100)::VARCHAR AS collection_identifier,
        | printf('%s_%d', strftime(o_orderdate, '%Y%m%d'), o_orderkey % 7) AS background_identifier,
        | date_diff('day', DATE '1995-01-01', o_orderdate)::INT AS days_since_epoch
        |FROM orders""".stripMargin,

    "p06" ->
      """SELECT l_orderkey,
        | count(CASE WHEN l_returnflag='R' THEN 1 END)::BIGINT AS n_r,
        | count(CASE WHEN l_returnflag='A' THEN 1 END)::BIGINT AS n_a,
        | count(CASE WHEN l_returnflag='N' THEN 1 END)::BIGINT AS n_n,
        | true AS ready
        |FROM lineitem GROUP BY 1
        |HAVING count(CASE WHEN l_returnflag='R' THEN 1 END) >= 1
        |   AND count(CASE WHEN l_returnflag='N' THEN 1 END) >= 2""".stripMargin,

    "p07" ->
      """SELECT o_orderkey, o_orderdate, newest_input
        |FROM orders
        |JOIN (SELECT l_orderkey, max(l_shipdate) AS newest_input
        |      FROM lineitem GROUP BY 1) ON o_orderkey = l_orderkey
        |WHERE newest_input > o_orderdate + INTERVAL '100 days'""".stripMargin,

    "p08" ->
      """SELECT l_orderkey,
        | string_agg(printf('%.2f', l_quantity), ',' ORDER BY l_linenumber, l_quantity) AS qty_series,
        | arg_min(l_extendedprice, l_linenumber * 1e9 + l_extendedprice) AS first_price,
        | count(1)::BIGINT AS n
        |FROM lineitem GROUP BY 1""".stripMargin,

    "p09" ->
      """SELECT l_orderkey, l_linenumber,
        | l_quantity AS q_mm_value,
        | 'mm' AS q_mm_units,
        | round(l_quantity/1000.0, 6) AS q_m_value,
        | 'm' AS q_m_units,
        | round(l_partkey * 75e-6, 6) AS det_pos_m
        |FROM lineitem WHERE l_orderkey % 97 = 0""".stripMargin)
}
