package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Event-time operators over the `events` table: as-of join (SURVEY §2.3 J2),
  * tumbling / sliding / session windows (SURVEY §2.9 — same transforms the
  * streaming module runs with `readStream`; batch here for the oracle gate).
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Backward as-of join: each purchase gets the user's latest click at or
    // before it. Single-shuffle union-window implementation (AsOfJoin).
    "q21" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // Pre-aggregate the right side to distinct (user, ts) so tie-breaking
      // is deterministic in both engines.
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_event_id"))
      AsOfJoin.backward(purchases, clicks,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "click_ts",
          joinType = "inner")
        .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"),
          col("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    },

    // Same as-of semantics through the skew-hardened bucketed path: window
    // partitions are (user_id, hour-bucket) instead of user_id alone, the
    // shape that keeps partitions bounded when the equi-key is low-
    // cardinality. Oracle: identical DuckDB ASOF JOIN as q21.
    "q33" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_event_id"))
      AsOfJoin.backwardBucketed(purchases, clicks,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "click_ts",
          bucketOf = c => floor(unix_micros(c) / 3600000000L),
          joinType = "inner")
        .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"),
          col("click_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
    },

    // Funnel conversion: per day, how many purchases had a click at most
    // one hour before (as-of left join -> conditional aggregation).
    "q31" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("event_id")).as("click_event_id"))
      AsOfJoin.backward(purchases, clicks,
          keys = Seq("user_id"), leftTime = "ts", rightTime = "click_ts",
          joinType = "left")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_purchases"),
          count(col("click_ts")).as("n_with_prior_click"),
          count(when(unix_micros(col("ts")) - unix_micros(col("click_ts")) <= 3600000000L, 1))
            .as("n_converted_1h"))
        .withColumn("conversion_rate",
          floor(col("n_converted_1h") / col("n_purchases") * 10000) / 10000)
    },

    // Tumbling window aggregation (10-minute buckets, epoch-aligned — same
    // alignment as DuckDB time_bucket).
    "q22" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    },

    // Sliding window: 20-minute windows every 10 minutes — each event lands
    // in exactly two windows.
    "q23" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "20 minutes", "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    },

    // Session windows with a 30-minute gap per user. Spark's session_window
    // end = last event + gap; the oracle reproduces it with gaps-and-islands.
    "q24" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("user_id"), col("n_events"), col("sum_value"))
    },

    // Semi-structured payload extraction: pull a typed field out of the
    // JSON `props` column and aggregate on it — the schema-on-read path for
    // event streams whose payload evolves independently of the table
    // schema. get_json_object is a codegen'd path expression (one parse per
    // row, no UDF); at 100 TB prefer from_json with an explicit schema when
    // the payload shape is known, so the parse happens once for all fields.
    "q34" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("k")), 4).as("avg_k"),
          max(col("k")).as("max_k"),
          count(when(col("k") >= 50, 1)).as("n_high"))
    },

    // Cohort retention: users grouped by first-seen week, retention = the
    // share of each cohort active again N weeks later — the analytics
    // staple whose 100 TB shape is two hash aggs (first-seen per user,
    // distinct activity weeks per user) + a broadcast of the tiny cohort
    // dimension. Week truncation is Monday-based on both engines; week_n
    // is an exact integer (both weeks are Monday-truncated, so the day
    // delta is always a multiple of 7 — `div` not float division).
    "q41" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("user_id"), col("ts"))
      val firstW = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
        .distinct()
      val sizes = firstW.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_size"))
      activity.join(firstW, Seq("user_id"))
        .withColumn("week_n",
          expr("CAST(datediff(week, cohort_week) div 7 AS INT)"))
        .groupBy(col("cohort_week"), col("week_n"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(broadcast(sizes), Seq("cohort_week"))
        .withColumn("retention",
          round(col("n_active") / col("cohort_size"), 4))
        .select(col("cohort_week"), col("week_n"), col("n_active"),
          col("cohort_size"), col("retention"))
    },

    // Per-user outlier detection: events whose value z-score against the
    // user's own distribution exceeds 2 — the metrics-anomaly staple.
    // One user-keyed stats aggregate broadcast back onto the stream; the
    // FP discipline is the knife-edge one: avg/stddev over doubles are
    // summation-order-dependent (Spark partial aggs vs DuckDB), so the
    // GATE compares the z-score ROUNDED to 4 decimals — cross-engine
    // deltas are ~1e-12 relative, which the rounding absorbs except on
    // astronomically unlikely exact boundaries (t13's accepted class).
    // Single-event users (stddev null) and zero-variance users (stddev 0)
    // emit no anomalies by definition — the join drops them via the
    // sd > 0 gate, never by divide-by-null surprise.
    "q42" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"))
      val st = ev.groupBy(col("user_id"))
        .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"),
          count(lit(1)).as("n_events"))
        .filter(col("sd") > 0)
      ev.join(st, Seq("user_id"))
        .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
        .filter(abs(col("z")) > 2)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_anomalies"),
          max(abs(col("z"))).as("max_abs_z"),
          min(col("event_id")).as("first_event"))
    },

    // Strict ORDERED funnel (view → click → purchase): unlike q31's
    // as-of conversion window, each stage must happen strictly AFTER the
    // user's first completion of the previous stage — the product-
    // analytics funnel definition. Shape: ONE events scan + ONE
    // user-keyed shuffle. The naive staged form (min-view agg, join
    // clicks, join purchases) re-derives each stage's input and scans
    // the events table up to six times; here two chained window passes
    // over the SAME user partitioning (no re-shuffle between them)
    // compute the running first-view and first-qualifying-click, and
    // every stage gate compares VALUES (ts > running-min), not window
    // positions — which is what makes tie order irrelevant: a click at
    // exactly the first view's timestamp fails `ts > vrun` whether the
    // view sorted before or after it, so no event_id tiebreak is even
    // needed. The correctness argument for the single pass: a purchase
    // qualifies iff it is after the FIRST qualifying click c*, and any
    // qualifying click in the purchase's prefix is ≥ c*, so
    // `ts > min(prefix qualifying clicks)` ⟺ `ts > c*`. No FP anywhere
    // until the final rounded rates.
    "q46" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val perUser = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("vrun",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("cq", when(col("event_type") === "click" &&
          col("ts") > col("vrun"), col("ts")))
        .withColumn("crun", min(col("cq")).over(w))
        .withColumn("pq", when(col("event_type") === "purchase" &&
          col("ts") > col("crun"), col("ts")))
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"),
          min(col("cq")).as("c_ts"), min(col("pq")).as("p_ts"))
      perUser
        .agg(count(col("v_ts")).as("n_view"),
          count(col("c_ts")).as("n_view_click"),
          count(col("p_ts")).as("n_full_funnel"))
        .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
          round(col("n_view_click").cast("double") / col("n_view"), 4)
            .as("click_rate"),
          round(col("n_full_funnel").cast("double") / col("n_view"), 4)
            .as("funnel_rate"))
    },

    // Event-type transition matrix (first-order Markov over each user's
    // event sequence): the clickstream-analytics staple behind "what do
    // users do after X". ONE user-keyed window shuffle produces the
    // (from, to) pairs; the pair aggregate combines map-side into a
    // frame bounded by #event_types² (25 rows here) regardless of corpus
    // size, and the row-total dimension broadcasts back. Ties on ts are
    // broken by event_id so the sequence — and therefore the matrix —
    // is deterministic on both engines.
    "q47" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      // row totals off the ≤|types|²-row PAIR frame (the oracle's own
      // construction) — deriving them from the window output would run
      // the sort+window pass a second time
      val totals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      pairs.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("n_from"), 4).as("p"))
    })

  val oracle: Map[String, String] = Map(
    "q21" ->
      """WITH clicks AS (
        |  SELECT user_id, ts::TIMESTAMP AS click_ts, max(event_id)::BIGINT AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT event_id, p.user_id, p.ts::TIMESTAMP AS ts, c.click_ts, c.click_event_id,
        |  (epoch_us(p.ts::TIMESTAMP) - epoch_us(c.click_ts))::BIGINT AS gap_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts::TIMESTAMP >= c.click_ts""".stripMargin,

    "q33" ->
      """WITH clicks AS (
        |  SELECT user_id, ts::TIMESTAMP AS click_ts, max(event_id)::BIGINT AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT event_id, p.user_id, p.ts::TIMESTAMP AS ts, c.click_ts, c.click_event_id,
        |  (epoch_us(p.ts::TIMESTAMP) - epoch_us(c.click_ts))::BIGINT AS gap_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts::TIMESTAMP >= c.click_ts""".stripMargin,

    "q31" ->
      """WITH clicks AS (
        |  SELECT user_id, ts::TIMESTAMP AS click_ts, max(event_id)::BIGINT AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |conv AS (
        |  SELECT p.ts::TIMESTAMP AS ts, c.click_ts
        |  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts::TIMESTAMP >= c.click_ts)
        |SELECT ts::DATE AS day,
        | count(1)::BIGINT AS n_purchases,
        | count(click_ts)::BIGINT AS n_with_prior_click,
        | count(CASE WHEN epoch_us(ts) - epoch_us(click_ts) <= 3600000000 THEN 1 END)::BIGINT AS n_converted_1h,
        | floor(count(CASE WHEN epoch_us(ts) - epoch_us(click_ts) <= 3600000000 THEN 1 END)::DOUBLE
        |       / count(1) * 10000) / 10000 AS conversion_rate
        |FROM conv GROUP BY 1""".stripMargin,

    "q22" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS w_start, event_type,
        | count(1)::BIGINT AS n, round(sum(value),4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q23" ->
      """SELECT w_start, event_type, count(1)::BIGINT AS n, round(sum(value),4) AS sum_value
        |FROM (
        |  SELECT unnest([time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP),
        |                 time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) - INTERVAL '10 minutes']) AS w_start,
        |         event_type, value
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "q24" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, value,
        |    CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
        |           OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER w >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM e)
        |SELECT min(ts) AS session_start,
        |       max(ts) + INTERVAL '30 minutes' AS session_end,
        |       user_id, count(1)::BIGINT AS n_events, round(sum(value),4) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q34" ->
      """WITH e AS (
        |  SELECT event_type, json_extract_string(props, '$.k')::INT AS k
        |  FROM events)
        |SELECT event_type, count(1)::BIGINT AS n,
        | round(avg(k), 4) AS avg_k,
        | max(k) AS max_k,
        | count(CASE WHEN k >= 50 THEN 1 END)::BIGINT AS n_high
        |FROM e GROUP BY event_type""".stripMargin,

    "q41" ->
      """WITH fw AS (
        |  SELECT user_id, date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
        |  FROM events GROUP BY 1),
        |ac AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS week
        |  FROM events),
        |j AS (
        |  SELECT ac.user_id, cohort_week,
        |    (datediff('day', cohort_week::DATE, week::DATE) // 7)::INT AS week_n
        |  FROM ac JOIN fw USING (user_id)),
        |a AS (
        |  SELECT cohort_week, week_n, count(DISTINCT user_id)::BIGINT AS n_active
        |  FROM j GROUP BY 1, 2),
        |sz AS (SELECT cohort_week, count(*)::BIGINT AS cohort_size
        |       FROM fw GROUP BY 1)
        |SELECT a.cohort_week, a.week_n, a.n_active, sz.cohort_size,
        |  round(a.n_active / sz.cohort_size, 4) AS retention
        |FROM a JOIN sz USING (cohort_week)""".stripMargin,

    "q42" ->
      """WITH st AS (
        |  SELECT user_id, avg(value) AS mu, stddev_samp(value) AS sd,
        |    count(*)::BIGINT AS n_events
        |  FROM events GROUP BY 1 HAVING stddev_samp(value) > 0),
        |z AS (
        |  SELECT e.user_id, e.event_id,
        |    round((e.value - st.mu) / st.sd, 4) AS z
        |  FROM events e JOIN st USING (user_id))
        |SELECT user_id, count(*)::BIGINT AS n_anomalies,
        |  max(abs(z)) AS max_abs_z, min(event_id)::BIGINT AS first_event
        |FROM z WHERE abs(z) > 2 GROUP BY 1""".stripMargin,

    "q46" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
        |  (SELECT count(*) FROM c)::BIGINT AS n_view_click,
        |  (SELECT count(*) FROM p)::BIGINT AS n_full_funnel,
        |  round((SELECT count(*) FROM c)::DOUBLE
        |        / (SELECT count(*) FROM v), 4) AS click_rate,
        |  round((SELECT count(*) FROM p)::DOUBLE
        |        / (SELECT count(*) FROM v), 4) AS funnel_rate""".stripMargin,

    "q47" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (
        |  SELECT from_type, sum(n)::BIGINT AS n_from FROM pairs GROUP BY 1)
        |SELECT from_type, to_type, n,
        |  round(n::DOUBLE / n_from, 4) AS p
        |FROM pairs JOIN tot USING (from_type)""".stripMargin)
}
