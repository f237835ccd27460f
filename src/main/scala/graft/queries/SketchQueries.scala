package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate/sketch aggregates (SURVEY §2.5 note: "free from Spark", in
  * scope for the generic surface). x01/x02 intentionally carry NO DuckDB
  * oracle — different engines implement different sketches, so results are
  * approximate-by-contract and the driver applies its rows-only check. The
  * exact counterparts are oracle-checked in q13. x03 and x04
  * are the exceptions: their sketches (count-min; k-minimum-values) are
  * built from the portable md5 hash family, so the sketch state itself is
  * deterministic and the full estimate pipelines ARE oracle-checked.
  *
  * Scale note: this is the 100 TB path for distinct counting — HLL sketches
  * merge map-side, so cardinality estimation costs one scan and a tiny
  * shuffle, where exact countDistinct re-shuffles the full key set.
  */
object SketchQueries {

  /** x03 count-min geometry: depth 4 hash rows × width 1024 buckets. The
    * sketch table is ≤ 4096 rows REGARDLESS of corpus size — that bound is
    * the whole point at 100 TB (the exact vocabulary aggregation's shuffle
    * grows with the corpus; the sketch's does not). */
  private val CmsDepth = 4
  private val CmsWidth = 1024

  /** Portable per-row bucket: first 8 md5 hex chars of "j:tok" mod width —
    * identical in DuckDB as ('0x'||substr(md5(j||':'||tok),1,8))::BIGINT %
    * width. The hash input carries the row index so the CmsDepth hash
    * functions are independent. */
  private def cmsBucket(j: org.apache.spark.sql.Column,
                        tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(graft.functions.TextFns.md5Hash32Keyed(j, tok), lit(CmsWidth.toLong))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x01" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // default 5% rsd: a tighter rsd quadruples the HLL register set
          // for little analytical value at this cardinality
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"),
          count(lit(1)).as("n_rows"))
    },

    "x02" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          // one sketch pass for both percentiles (array form), not two;
          // split into scalar columns so the result is comparison-friendly
          element_at(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(1000)), 1).as("p50_price"),
          element_at(percentile_approx(col("l_extendedprice"),
            array(lit(0.5), lit(0.95)), lit(1000)), 2).as("p95_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
    },

    // Count-min-sketch heavy hitters over the document token stream, with
    // the estimate error made visible: build the 4×1024 sketch in one
    // explode + one hash aggregation, take the exact top-20 tokens
    // (TakeOrderedAndProject — the exact side exists to measure the
    // sketch, not to rank at scale), probe each token's 4 buckets and
    // report min(bucket) alongside the exact count. overcount ≥ 0 always —
    // CMS never undercounts — and the whole pipeline is deterministic
    // because the hash family is the portable md5 construction, so unlike
    // x01/x02 this sketch IS oracle-checked exactly. The probe joins
    // against a ≤4096-row sketch and a 20-row top-k: both broadcast-sized
    // at any corpus scale.
    "x03" -> { (s, dir) =>
      val toks = Tables.loadSpread(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_count"))
      val cms = toks
        .select(col("tok"), explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
        .groupBy(col("j"), cmsBucket(col("j"), col("tok")).as("bucket"))
        .agg(count(lit(1)).as("bcount"))
      val top20 = exact.orderBy(col("exact_count").desc, col("tok").asc).limit(20)
      top20
        .select(col("tok"), col("exact_count"),
          explode(sequence(lit(0), lit(CmsDepth - 1))).as("j"))
        .withColumn("bucket", cmsBucket(col("j"), col("tok")))
        .join(cms, Seq("j", "bucket"))
        .groupBy(col("tok"), col("exact_count"))
        .agg(min(col("bcount")).as("cms_estimate"))
        .withColumn("overcount", col("cms_estimate") - col("exact_count"))
    },

    // KMV (k-minimum-values) distinct-count sketch over the token
    // vocabulary — the same portability trick as x03: the md5 hash family
    // makes the sketch STATE deterministic, so unlike x01's
    // engine-specific HLL (rows-only by contract) the whole estimate
    // pipeline is oracle-checked exactly. Sketch = the k smallest
    // DISTINCT 32-bit hashes; estimator (k-1) * 2^32 div h_k (integer
    // floor division, bit-identical cross-engine), exact when the
    // vocabulary has fewer than k members. 100 TB shape: the distinct
    // shuffle carries hash values only (vocabulary-bounded, like t09)
    // and the k-cut is a TakeOrderedAndProject — k rows out regardless
    // of corpus size. n_exact (the true distinct-hash count) rides along
    // as the reference column, same pattern as x03's exact_count.
    "x04" -> { (s, dir) =>
      val k = 64
      val hashes = Tables.loadSpread(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .select(graft.functions.TextFns.md5Hash32(col("tok")).as("h"))
        .distinct()
      val sk = hashes.orderBy(col("h")).limit(k)
        .agg(count(lit(1)).as("k_obs"), max(col("h")).as("h_k"))
      val ex = hashes.agg(count(lit(1)).as("n_exact"))
      // 1-row x 1-row cross join (both aggregates), broadcast by AQE —
      // never a corpus-sized product
      // h_k = 0 (token hashing to exactly 0 among the k minima) must not
      // divide: Spark's div would yield null while DuckDB's // ERRORS —
      // both engines take the guarded CASE arm instead
      sk.crossJoin(ex).select(
        col("k_obs"), col("h_k"),
        expr(s"case when k_obs < $k then k_obs when h_k = 0 then null " +
          s"else ${k - 1}L * 4294967296L div h_k end").as("est_distinct"),
        col("n_exact"))
    },

    // KMV SET OPERATIONS: union cardinality + Jaccard similarity between
    // two corpora's token vocabularies from their bottom-k sketches alone
    // (Beyer et al., "On synopses for distinct-value estimation under
    // multiset operations", SIGMOD'07). MinK(A u B) = bottom-k of
    // MinK(A) u MinK(B) — union sketches merge from the k-row summaries
    // without revisiting the corpora — and Jaccard is estimated by the
    // fraction of the union sketch's minima present in BOTH input
    // sketches (membership in MinK(X) below X's k-th minimum IS
    // membership in X). 100 TB shape: one scan builds both per-source
    // sketches (vocabulary-bounded distinct + TakeOrderedAndProject
    // k-cut, the x04 path); everything downstream operates on <= 2k rows.
    // The exact intersection/union counts ride along as reference
    // columns, same pattern as x03/x04 — at true corpus scale one drops
    // the exact branch and keeps the sketch estimates.
    "x05" -> { (s, dir) =>
      val k = 64
      val hashes = Tables.loadSpread(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"),
          explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .select(col("source"),
          graft.functions.TextFns.md5Hash32(col("tok")).as("h"))
        .distinct()
      def mink(src: String) = hashes.filter(col("source") === src)
        .select(col("h")).orderBy(col("h")).limit(k)
      val ka = mink("src0")
      val kb = mink("src1")
      val ku = ka.union(kb).distinct().orderBy(col("h")).limit(k)
      // <= 64-row frames: the semi-joins and cross joins below are all
      // broadcast by AQE, never a shuffle
      val inter = ku.join(ka, Seq("h"), "left_semi")
        .join(kb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("n_inter"))
      val sk = ku.agg(count(lit(1)).as("k_obs"), max(col("h")).as("h_k"))
      val exact = hashes.groupBy(col("h"))
        .agg(max(when(col("source") === "src0", 1).otherwise(0)).as("in_a"),
          max(when(col("source") === "src1", 1).otherwise(0)).as("in_b"))
        .agg(sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_inter_exact"),
          count(lit(1)).as("n_union_exact"))
      sk.crossJoin(inter).crossJoin(exact).select(
        col("k_obs"), col("h_k"),
        expr(s"case when k_obs < $k then k_obs when h_k = 0 then null " +
          s"else ${k - 1}L * 4294967296L div h_k end").as("est_union"),
        col("n_inter"),
        round(col("n_inter") / col("k_obs"), 6).as("jaccard_est"),
        col("n_inter_exact"), col("n_union_exact"),
        round(col("n_inter_exact") / col("n_union_exact"), 6)
          .as("jaccard_exact"))
    },

    // Linear (bitmap) counting, Whang et al. TODS'90 — the third portable
    // distinct sketch next to x04's KMV: hash each token into an m-bucket
    // bitmap, estimate n̂ = m·ln(m / empty). Like x03/x04 the md5 family
    // makes the sketch STATE deterministic, so the estimate is
    // oracle-exact (ln of an exact integer ratio, reported rounded).
    // 100 TB shape: the shuffle carries distinct bucket ids (≤ m = 4096
    // rows out of any corpus); the saturation guard (empty = 0 → NULL)
    // takes the same guarded-CASE arm on both engines instead of ±inf.
    "x07" -> { (s, dir) =>
      val m = 4096
      val occ = Tables.loadSpread(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .select(pmod(graft.functions.TextFns.md5Hash32(col("tok")),
          lit(m.toLong)).as("bucket"))
        .distinct()
        .agg(count(lit(1)).as("occupied"))
      val ex = Tables.loadSpread(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
        .select(graft.functions.TextFns.md5Hash32(col("tok")).as("h"))
        .distinct().agg(count(lit(1)).as("n_exact"))
      occ.crossJoin(ex).select(
        lit(m).as("m"), col("occupied"),
        when(col("occupied") < m,
          round(lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m) - col("occupied"))), 4))
          .otherwise(lit(null).cast("double")).as("est_distinct"),
        col("n_exact"))
    },

    // AMS (Alon–Matias–Szegedy) second-moment sketch: estimate
    // F₂ = Σ_tok f², the self-join size / collision mass that prices
    // d04-class inverted-index joins BEFORE running them. R independent
    // ±1 hash rows; each row's S_r = Σ sign(h_r(tok)) over OCCURRENCES,
    // E[S_r²] = F₂. The 100 TB shape is the textbook one: the sign sum
    // combines map-side, so the sketch shuffle is R ROWS regardless of
    // corpus size (vs the vocabulary-sized exact agg it estimates —
    // which rides along as the reference, x03's pattern). Everything is
    // integer (md5 parity bit, long sums, div-16 mean; the relative
    // error alone rounds at the end), so the estimate is bit-identical
    // cross-engine.
    "x08" -> { (s, dir) =>
      val rRows = 16
      val toks = Tables.loadSpread(s, dir, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      val sketch = toks
        .select(col("tok"), explode(sequence(lit(0), lit(rRows - 1))).as("r"))
        .select(col("r"),
          when(pmod(graft.functions.TextFns.md5Hash32Keyed(col("r"), col("tok")),
            lit(2L)) === 0L, 1L).otherwise(-1L).as("sign"))
        .groupBy(col("r")).agg(sum(col("sign")).as("s"))
        .agg(sum(col("s") * col("s")).as("sum_sq"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).as("exact_f2"))
      sketch.crossJoin(broadcast(exact)).select(
        lit(rRows).as("r_rows"),
        expr("sum_sq div 16").as("est_f2"),
        col("exact_f2"),
        round((col("sum_sq").cast("double") / rRows) / col("exact_f2") - 1, 4)
          .as("rel_err"))
    },

    // Z-order (Morton) clustering keys — the multi-dim layout key behind
    // lakehouse OPTIMIZE ZORDER: interleave(l_orderkey, l_partkey) makes
    // BOTH columns' parquet footer stats selective once the table is
    // range-partitioned by z (ZOrderSpec measures the file-pruning win;
    // this query pins the KEY ARITHMETIC against the oracle's bit-sum
    // formulation — magic-mask dilation vs Σ bit·2^pos, bit-identical).
    // Output is the per-top-byte histogram + a modular checksum, so the
    // dump stays small while every row's key feeds the comparison.
    "x06" -> { (s, dir) =>
      val z = graft.functions.ZOrder
        .interleave(col("l_orderkey"), col("l_partkey"))
      Tables.load(s, dir, "lineitem")
        .select(z.as("z"))
        .groupBy(shiftrightunsigned(col("z"), 22).as("bucket"))
        .agg(count(lit(1)).as("n"), min(col("z")).as("min_z"),
          max(col("z")).as("max_z"),
          sum(col("z") % 1000003L).as("checksum"))
    })

  /** x01/x02: no oracle by design (approximate results; driver records
    * rows-only). x03's md5-keyed sketch is deterministic → full oracle. */
  val oracle: Map[String, String] = Map(
    "x03" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |exact AS (
        |  SELECT tok, count(*)::BIGINT AS exact_count FROM tk GROUP BY tok),
        |hashed AS (
        |  SELECT tok, j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || tok), 1, 8))::BIGINT
        |      % 1024 AS bucket
        |  FROM tk CROSS JOIN (SELECT unnest(range(4)) AS j)),
        |cms AS (
        |  SELECT j, bucket, count(*)::BIGINT AS bcount
        |  FROM hashed GROUP BY 1, 2),
        |top20 AS (
        |  SELECT tok, exact_count FROM exact
        |  ORDER BY exact_count DESC, tok ASC LIMIT 20),
        |probes AS (
        |  SELECT t.tok, t.exact_count, j,
        |    ('0x' || substr(md5(j::VARCHAR || ':' || t.tok), 1, 8))::BIGINT
        |      % 1024 AS bucket
        |  FROM top20 t CROSS JOIN (SELECT unnest(range(4)) AS j))
        |SELECT p.tok, p.exact_count,
        |  min(c.bcount) AS cms_estimate,
        |  min(c.bcount) - p.exact_count AS overcount
        |FROM probes p JOIN cms c ON p.j = c.j AND p.bucket = c.bucket
        |GROUP BY 1, 2""".stripMargin,

    "x04" ->
      """WITH h AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+'))
        |          AS tok FROM documents)),
        |k AS (SELECT h FROM h ORDER BY h LIMIT 64),
        |sk AS (SELECT count(1)::BIGINT AS k_obs, max(h) AS h_k FROM k),
        |ex AS (SELECT count(1)::BIGINT AS n_exact FROM h)
        |SELECT k_obs, h_k,
        |  (CASE WHEN k_obs < 64 THEN k_obs
        |        WHEN h_k = 0 THEN NULL
        |        ELSE (63::BIGINT * 4294967296) // h_k END)::BIGINT
        |    AS est_distinct,
        |  n_exact
        |FROM sk, ex""".stripMargin,

    "x05" ->
      """WITH tk AS (
        |  SELECT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |h AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
        |  FROM tk),
        |ka AS (SELECT h FROM h WHERE source = 'src0' ORDER BY h LIMIT 64),
        |kb AS (SELECT h FROM h WHERE source = 'src1' ORDER BY h LIMIT 64),
        |ku AS (
        |  SELECT DISTINCT h
        |  FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |  ORDER BY h LIMIT 64),
        |inter AS (
        |  SELECT count(1)::BIGINT AS n_inter FROM ku
        |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |sk AS (SELECT count(1)::BIGINT AS k_obs, max(h) AS h_k FROM ku),
        |flags AS (
        |  SELECT h, max(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS in_a,
        |    max(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS in_b
        |  FROM h GROUP BY h),
        |exact AS (
        |  SELECT sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0
        |    END)::BIGINT AS n_inter_exact,
        |    count(1)::BIGINT AS n_union_exact
        |  FROM flags)
        |SELECT k_obs, h_k,
        |  (CASE WHEN k_obs < 64 THEN k_obs
        |        WHEN h_k = 0 THEN NULL
        |        ELSE (63::BIGINT * 4294967296) // h_k END)::BIGINT
        |    AS est_union,
        |  n_inter,
        |  round(n_inter / k_obs, 6) AS jaccard_est,
        |  n_inter_exact, n_union_exact,
        |  round(n_inter_exact / n_union_exact, 6) AS jaccard_exact
        |FROM sk, inter, exact""".stripMargin,

    "x07" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |h AS (
        |  SELECT DISTINCT ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
        |  FROM tk),
        |occ AS (
        |  SELECT count(*)::BIGINT AS occupied
        |  FROM (SELECT DISTINCT hv % 4096 FROM h)),
        |ex AS (SELECT count(*)::BIGINT AS n_exact FROM h)
        |SELECT 4096 AS m, occupied,
        |  CASE WHEN occupied < 4096
        |       THEN round(4096.0 * ln(4096.0 / (4096 - occupied)), 4)
        |       ELSE NULL END AS est_distinct,
        |  n_exact
        |FROM occ, ex""".stripMargin,

    "x08" ->
      """WITH tk AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |rows_ AS (
        |  SELECT tok, r,
        |    CASE WHEN ('0x' || substr(md5(r::VARCHAR || ':' || tok), 1, 8)
        |              )::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sign
        |  FROM tk CROSS JOIN (SELECT unnest(range(16)) AS r)),
        |sk AS (
        |  SELECT r, sum(sign)::BIGINT AS s FROM rows_ GROUP BY 1),
        |sq AS (SELECT sum(s * s)::BIGINT AS sum_sq FROM sk),
        |ex AS (
        |  SELECT sum(f * f)::BIGINT AS exact_f2
        |  FROM (SELECT count(*)::BIGINT AS f FROM tk GROUP BY tok))
        |SELECT 16 AS r_rows, (sum_sq // 16)::BIGINT AS est_f2, exact_f2,
        |  round((sum_sq::DOUBLE / 16) / exact_f2 - 1, 4) AS rel_err
        |FROM sq, ex""".stripMargin,

    "x06" ->
      """WITH z AS (
        |  SELECT (SELECT sum((((l_orderkey >> i) & 1) << (2 * i))
        |                   + (((l_partkey >> i) & 1) << (2 * i + 1)))
        |          FROM range(31) t(i))::BIGINT AS z
        |  FROM lineitem)
        |SELECT (z >> 22)::BIGINT AS bucket, count(1)::BIGINT AS n,
        |  min(z)::BIGINT AS min_z, max(z)::BIGINT AS max_z,
        |  sum(z % 1000003)::BIGINT AS checksum
        |FROM z GROUP BY 1""".stripMargin)
}
