package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Text-analysis surface over the `documents` table: token statistics,
  * quality scoring, marker-based language-ID, and content fingerprinting.
  * All pure column expressions (whole-stage codegen; no UDFs) — the shape
  * that scans 100 TB of text without python/serialization overhead.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(s, dir, "documents")

  private val stopwords = Seq("the", "a")

  // marker vocabularies for the language-ID heuristic; tie-break order en,
  // es, fr, de, zh (alphabetical on score-equality is encoded in the CASE
  // chain both here and in the oracle).
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("key", "value", "data"),
    "fr" -> Seq("table", "column", "row"),
    "de" -> Seq("stream", "batch", "spark"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Token statistics: count / distinct count / average token length.
    "t01" -> { (s, dir) =>
      val toks = TextFns.tokens(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        (floor(
          aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
            size(toks).cast("double") * 10000) / 10000).as("avg_token_len"))
    },

    // Quality heuristics: char-class ratios + stopword ratio + type-token
    // ratio, combined into one score (weights arbitrary but fixed).
    // floor-scaling instead of round(): these are ratios of small integers,
    // which land exactly on .5 decimal ties where Spark (HALF_UP) and DuckDB
    // disagree; floor is tie-free since both engines hold identical doubles.
    "t02" -> { (s, dir) =>
      def f4(c: org.apache.spark.sql.Column) = floor(c * 10000) / 10000
      val toks = TextFns.tokens(col("text"))
      val alphaRatio = TextFns.charClassRatio(col("text"), "[a-z]")
      val spaceRatio = TextFns.charClassRatio(col("text"), "[ ]")
      val stopRatio = TextFns.tokenSetRatio(toks, stopwords)
      val ttr = size(array_distinct(toks)).cast("double") / size(toks).cast("double")
      docs(s, dir).select(
        col("doc_id"),
        f4(alphaRatio).as("alpha_ratio"),
        f4(spaceRatio).as("space_ratio"),
        f4(stopRatio).as("stopword_ratio"),
        f4(ttr).as("ttr"),
        f4(alphaRatio * 0.3 + (lit(1.0) - stopRatio) * 0.3 + ttr * 0.4).as("quality"))
    },

    // Marker-vocabulary language ID (n-gram-heuristic family): score each
    // language by marker-token hits, argmax with a fixed tie-break chain.
    "t03" -> { (s, dir) => langPred(s, dir) },

    // Language-ID QUALITY audit: the confusion matrix + per-class recall
    // of t03's marker classifier against the labeled column — the
    // evaluation every heuristic classifier ships with (the s07/d19
    // measurement-loop pattern, for langid). Two tiny aggregations over
    // t03's scored frame; the per-class total joins back broadcast.
    "t15" -> { (s, dir) =>
      val pred = langPred(s, dir)
        .select(col("actual_lang"), col("pred_lang"))
      val cell = pred.groupBy(col("actual_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val totals = pred.groupBy(col("actual_lang"))
        .agg(count(lit(1)).as("n_actual"))
      cell.join(broadcast(totals), Seq("actual_lang"))
        .select(col("actual_lang"), col("pred_lang"), col("n"),
          col("n_actual"),
          round(col("n") / col("n_actual"), 4).as("frac"))
    },

    // Cleaning/normalization transform: lowercase, strip non-alpha chars,
    // collapse whitespace, drop stopwords — the canonical pre-tokenization
    // scrub of a training-data pipeline, pure codegen'd column ops.
    "t05" -> { (s, dir) =>
      val collapsed = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z ]", " "), " +", " ")
      val cleanToks = filter(split(trim(collapsed), " "),
        t => !array_contains(array(stopwords.map(lit): _*), t) && t =!= "")
      docs(s, dir).select(
        col("doc_id"),
        concat_ws(" ", cleanToks).as("clean_text"),
        size(cleanToks).as("n_clean_tokens"))
    },

    // Edit-distance near-dup on text prefixes (bounded all-pairs; the
    // fuzzy-matching counterpart of the hash-based dedup family).
    "t06" -> { (s, dir) =>
      val d = docs(s, dir).filter(col("doc_id") < 40)
        .select(col("doc_id"), substring(col("text"), 1, 30).as("prefix"))
      d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.prefix"), col("b.prefix")).as("edit_dist"))
        .filter(col("edit_dist") <= 20)
    },

    // Content fingerprints: full-text md5 prefix, portable 32-bit hash, and
    // a min-shingle-hash (winnowing-style document fingerprint).
    "t04" -> { (s, dir) =>
      val sh = TextFns.shingles(col("text"), 5)
      docs(s, dir).select(
        col("doc_id"),
        substring(md5(col("text")), 1, 16).as("md5_16"),
        TextFns.md5Hash32(col("text")).as("fp32"),
        TextFns.minHash(sh, 0).as("min_shingle_hash"))
    },

    // Overlapping token-window chunking (size 32, stride 24) — documents
    // become training-context-sized pieces. One generator per row
    // (explode of the start-offset sequence), chunk content verified by md5
    // so the gate hashes a scalar, not a string blob. All codegen'd; the
    // explode multiplies rows ~len/stride, which is the intended output
    // size, not an intermediate.
    "t07" -> { (s, dir) =>
      val chunkSize = 32
      val stride = 24
      docs(s, dir)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)),
            lit(stride))).as("chunk_pos"))
        .select(col("doc_id"), col("chunk_pos"),
          slice(col("toks"), col("chunk_pos") + 1, lit(chunkSize)).as("chunk"))
        .select(col("doc_id"), col("chunk_pos"),
          size(col("chunk")).as("n_chunk_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
    },

    // Intra-document repetition: the duplicated-3-gram fraction quality
    // signal (the within-doc cleaning stat web-corpus pipelines gate on —
    // high rep_ratio = boilerplate/spam). Pure array math above the scan:
    // no explode, no shuffle; docs shorter than one 3-gram drop out.
    // The shingle HOF is evaluated ONCE per row (no CSE for lambda
    // expressions — size(sh) and size(array_distinct(sh)) would double the
    // work); the total count is the cheap token arithmetic n_tokens - 2.
    "t08" -> { (s, dir) =>
      val nToks = size(TextFns.tokens(col("text")))
      docs(s, dir)
        .select(col("doc_id"),
          greatest(nToks - 2, lit(0)).cast("long").as("n_grams"),
          size(array_distinct(TextFns.shingles(col("text"), 3)))
            .cast("long").as("n_distinct"))
        .filter(col("n_grams") > 0)
        .withColumn("rep_ratio",
          floor((lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
            * 10000) / 10000)
    },

    // Corpus vocabulary statistics: per-token term frequency, document
    // frequency, and smoothed IDF — the vocab/IDF-building pass behind
    // quality filtering and tf-idf weighting. One explode + one hash
    // aggregation (map-side partial combine keyed by token; the shuffle
    // carries the DISTINCT vocabulary, which grows far slower than the
    // corpus); the corpus doc count joins in as a broadcast scalar; the
    // top-k cut is TakeOrderedAndProject, never a global sort.
    "t09" -> { (s, dir) =>
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      docs(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("term_freq"),
          countDistinct(col("doc_id")).as("doc_freq"))
        .crossJoin(broadcast(n))
        .withColumn("idf", floor(
          log(col("n_docs").cast("double") / col("doc_freq")) * 10000) / 10000)
        .drop("n_docs")
        .orderBy(col("term_freq").desc, col("tok").asc)
        .limit(100)
    },

    // Per-document top-3 TF-IDF terms — the keyword-extraction pass that
    // feeds topic routing / quality filters. Two hash aggregations (the
    // (doc, tok) term frequencies, then the tok-keyed document frequencies
    // derived FROM that tf set — the raw token stream is never re-scanned),
    // a tok-keyed join that stays hint-free (the vocabulary side is
    // distinct-token-sized; AQE broadcasts it whenever it measures small),
    // and one doc-keyed window for the per-document cut. Ranking is on the
    // floor-scaled score with a tok tie-break so ordering is
    // engine-independent.
    "t10" -> { (s, dir) =>
      val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val tf = docs(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      // count(when(tf >= 1, 1)), not count(1): tf >= 1 holds for every
      // group (it counts >= 1 rows), so the value is identical — but the
      // predicate keeps tf REFERENCED in a form the optimizer cannot
      // elide. With count(1) (or even count(tf), which
      // RemoveRedundantAggregates rewrites back to a distinct) this
      // branch's copy of the tf subtree slims to (doc_id, tok), stops
      // being plan-identical to the join-probe branch, and the final plan
      // paid a second tokenize + two extra aggregation exchanges
      // re-deriving tf. With it both consumers read one ReusedExchange
      // (guide §2.4 — share one exchange between same-keyed consumers).
      val dfreq = tf.groupBy(col("tok"))
        .agg(count(when(col("tf") >= 1, 1)).as("doc_freq"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok").asc)
      tf.join(dfreq, "tok")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", floor(
          col("tf") * log(col("n_docs").cast("double") / col("doc_freq"))
            * 10000) / 10000)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("tok"), col("tf"), col("doc_freq"),
          col("tfidf"), col("rank"))
    },

    // Blocklist scrub: the redaction pass of a training pipeline (PII /
    // banned-term removal) — global word-boundary regexp_replace chained
    // over the blocklist, with per-term hit counts for the audit trail.
    // The synthetic corpus carries no digits, so the machinery is
    // exercised with terms it actually contains rather than vacuously-
    // zero email/phone patterns. scrub_md5 pins REPLACEMENT parity with
    // the oracle (byte-identical scrubbed text), not just the counts.
    // At 100 TB the scrub is a pure codegen map over the scan — no
    // shuffle, no UDF; replacement order is part of the contract (terms
    // apply left-to-right; [REDACTED] contains no blocklisted substring,
    // so the chain is confluent here anyway).
    "t11" -> { (s, dir) =>
      val terms = Seq("spark", "hash", "merge")
      val scrubbed = terms.foldLeft(col("text")) {
        (c, t) => regexp_replace(c, s"\\b$t\\b", "[REDACTED]")
      }
      val counts = terms.map(t =>
        size(regexp_extract_all(col("text"), lit(s"\\b$t\\b"), lit(0)))
          .as(s"n_$t"))
      docs(s, dir).select(
        (col("doc_id") +: counts) :+
          length(scrubbed).as("scrub_len") :+
          md5(scrubbed).as("scrub_md5"): _*)
    },

    // PII detection + redaction (email / IPv4 / 13-16-digit card), the
    // scrub pass every published pretraining pipeline runs before release.
    // The synthetic corpus carries no PII, so the query PLANTS a
    // deterministic per-doc specimen suffix first — both engines build the
    // identical string, so the detectors exercise real matches instead of
    // certifying zeros. Everything is a codegen regexp above the scan (the
    // w01 class: row-local, no shuffle, flat at any scale); byte-parity of
    // the redacted text is pinned by length + md5 like t11. Patterns stay
    // inside the Java-regex ∩ RE2 common subset ('\b', bounded repeats,
    // classes — no lookaround, which RE2 lacks).
    "t12" -> { (s, dir) =>
      val planted = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@mail.example.org office 10."),
        (col("doc_id") % 256).cast("string"), lit(".0.1 card 4111111111111"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
      val cardRe = "\\b\\d{13,16}\\b"
      // email first (its local part may contain digits), then IPs, then
      // the bare digit runs that survive — same order in the oracle
      val scrub = regexp_replace(regexp_replace(regexp_replace(
        planted, emailRe, "<EMAIL>"), ipRe, "<IP>"), cardRe, "<CARD>")
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(planted, lit(emailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(planted, lit(ipRe), lit(0))).as("n_ip"),
        size(regexp_extract_all(planted, lit(cardRe), lit(0))).as("n_card"),
        length(scrub).as("scrub_len"),
        md5(scrub).as("scrub_md5"))
    },

    // Unigram-LM surprise scoring (the CCNet-class quality filter): each
    // document scored by its average negative log-likelihood under the
    // corpus's own unigram distribution — high-surprise docs are the
    // gibberish/off-domain candidates a perplexity filter drops. Same
    // exchange-reuse shape as t10 (the token counts feed both the vocab
    // frequencies and the per-doc join). FP discipline: a per-doc
    // sum(double) is summation-ORDER-dependent and Spark's partial aggs
    // order differently than DuckDB — so the per-token nll is floored to
    // a ×10⁴ FIXED-POINT LONG first (the t10-proven ln-parity basis) and
    // the doc score is an integer sum + integer division: bit-exact on
    // both engines regardless of aggregation order.
    "t13" -> { (s, dir) =>
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      val cnt = tok.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
      // Σ n_tok == count of the token stream, off the vocabulary-sized
      // count frame instead of a third tokenize pass over the corpus
      // (t17's nTot trick; the r21 final plan showed tot's branch paying
      // its own Generate over the scan). cnt's exchange is reused.
      val tot = cnt.agg(sum(col("n_tok")).as("n_total"))
      tok.join(cnt, "tok").crossJoin(broadcast(tot))
        .withColumn("nll_e4",
          floor(log(col("n_total").cast("double") / col("n_tok")) * 10000)
            .cast("long"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("nll_e4")).as("nll_sum_e4"))
        .select(col("doc_id"), col("n_tokens"), col("nll_sum_e4"),
          expr("nll_sum_e4 div n_tokens").as("avg_nll_e4"))
    },

    // Per-source distribution drift: KL(source ‖ corpus) over the unigram
    // distributions — the mixture-design diagnostic that says which
    // sources are off-domain BEFORE w06 weights them. One exploded-token
    // hash agg feeds everything (per-(source, tok) counts roll up to both
    // marginals — the t10/t13 reuse diamond); the KL terms live on the
    // tiny sources×vocab frame. Same fixed-point discipline as t13, at
    // ×10⁸ because individual terms are O(p·ln ratio) ≈ 1e-3 and a
    // coarser floor would swallow them; both engines build the IDENTICAL
    // double expression tree (ps, pc, ps·ln(ps/pc)) so the floor is the
    // only rounding site.
    "t14" -> { (s, dir) =>
      // The explicit isnotnull(source) mirrors the constraint the inner
      // joins below already infer on the st probe branch (null sources
      // never reach the OUTPUT either way, and the documents model emits
      // none — asserted non-null at every SF). Without it the inferred
      // filter exists on the probe branch only, the ct/tot subtrees
      // canonicalize differently, and the r21 final plan paid a SECOND
      // corpus scan + tokenize + two aggregation exchanges re-deriving
      // st for the corpus marginal (guide §2.4). With it all four
      // consumers read one ReusedExchange.
      val tok = docs(s, dir).filter(col("source").isNotNull)
        .select(col("source"), explode(TextFns.tokens(col("text"))).as("tok"))
      val st = tok.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("cnt_s"))
      val srcTot = st.groupBy(col("source")).agg(sum(col("cnt_s")).as("n_s"))
      val ct = st.groupBy(col("tok")).agg(sum(col("cnt_s")).as("cnt"))
      val tot = ct.agg(sum(col("cnt")).as("n"))
      val ps = col("cnt_s").cast("double") / col("n_s")
      val pc = col("cnt").cast("double") / col("n")
      st.join(srcTot, Seq("source")).join(ct, Seq("tok"))
        .crossJoin(broadcast(tot))
        .withColumn("term_e8", floor(ps * log(ps / pc) * 1e8).cast("long"))
        .groupBy(col("source"))
        .agg(min(col("n_s")).as("n_tokens"), count(lit(1)).as("vocab"),
          sum(col("term_e8")).as("kl_e8"))
    },

    // Zipf fit — see the scaladoc above `t03Sql` for the exact-integer
    // regression scheme. The rank window runs on the vocab-sized frame
    // (single partition, t09/w06's justified tiny-frame window).
    "t16" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val freq = docs(s, dir)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val ranked = freq.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
      val xy = ranked.select(
        floor(log(col("rank").cast("double")) * 10000).cast("long").as("x"),
        floor(log(col("freq").cast("double")) * 10000).cast("long").as("y"))
      val sums = xy.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      sums.select(col("n").as("n_vocab"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
        round((col("sy").cast("double") / col("n")) / 10000, 4)
          .as("mean_log_freq"))
    },

    // Bigram collocation mining (pointwise mutual information): which
    // adjacent token pairs co-occur far above chance — the corpus-
    // analysis step behind tokenizer-merge candidates and stop-phrase
    // lists. Shuffles are all vocabulary-bounded: one bigram hash agg
    // (map-side combined), one unigram hash agg, and the top-30 cut is a
    // TakeOrderedAndProject on INTEGER (count, bigram) keys — rank never
    // touches a double, so the cross-engine order is exact. PMI itself
    // rides along in t13's fixed-point-long discipline
    // (floor(ln·10⁴) — both engines evaluate the identical expression
    // tree on identical integers; the floor absorbs sub-ulp ln deltas
    // except on t13's accepted knife-edge class).
    "t17" -> { (s, dir) =>
      val bg = docs(s, dir)
        .select(explode(TextFns.shingles(col("text"), 2)).as("bg"))
      val uni = docs(s, dir)
        .select(explode(TextFns.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
      val cnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("c_xy"))
      // total bigram mass off the COUNT frame, not a third corpus scan —
      // the cnt subtree is byte-identical for both consumers, so the
      // shuffle is a ReusedExchange (PlanSpec-pinned) and the total costs
      // one vocabulary-sized agg instead of a scan+tokenize pass
      val nTot = cnt.agg(sum(col("c_xy")).as("n_bg"))
      val top = cnt
        .orderBy(col("c_xy").desc, col("bg").asc).limit(30)
        .withColumn("x", split(col("bg"), " ").getItem(0))
        .withColumn("y", split(col("bg"), " ").getItem(1))
      // the 30-row cut is ALWAYS the broadcast side — the unigram frame
      // is vocabulary-sized (100M+ terms at corpus scale) and streams
      // through both probes unshuffled
      uni.select(col("tok").as("x"), col("c_tok").as("c_x"))
        .join(broadcast(top), Seq("x"))
        .join(broadcast(uni.select(col("tok").as("y"), col("c_tok").as("c_y"))
          .join(broadcast(top.select(col("y")).distinct()), Seq("y"))),
          Seq("y"))
        .crossJoin(broadcast(nTot))
        .select(col("bg"), col("c_xy"), col("c_x"), col("c_y"),
          floor(log(col("c_xy").cast("double") * col("n_bg") /
            (col("c_x") * col("c_y"))) * 10000).cast("long").as("pmi_e4"))
    })

  /** t03's scored frame (doc_id, actual_lang, per-language marker scores,
    * pred_lang) — shared by the classifier (t03) and its audit (t15). */
  private def langPred(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    val scored = docs(s, dir).select(
      (col("doc_id") +: col("lang").as("actual_lang") +:
        langMarkers.map { case (lang, markers) =>
          size(filter(toks, t => array_contains(array(markers.map(lit): _*), t)))
            .as(s"score_$lang")
        }): _*)
    val maxScore = greatest(langMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    scored.withColumn("pred_lang",
      langMarkers.foldLeft(lit(null).cast("string")) { case (acc, (l, _)) =>
        when(acc.isNotNull, acc).otherwise(when(col(s"score_$l") === maxScore, lit(l)))
      })
  }

  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  private def markerScoreSql(markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($set)))::INT"
  }

  /** Zipf rank-frequency diagnostics (t16): the least-squares slope of
    * log-freq vs log-rank, computed with EXACT INTEGER arithmetic — both
    * lns are floored to ×10⁴ fixed-point longs and the regression's four
    * sums (Σx, Σy, Σxy, Σx²) are long sums, so numerator and denominator
    * are bit-identical across engines regardless of aggregation order;
    * only the final division is floating (reported rounded). Long-range
    * bound: |Σxy| ≤ vocab · (1.4e5)² ≈ 2e10·vocab, so the closed form is
    * exact to vocab ~10⁷ — far past any natural-language vocabulary
    * (the t09 argument: vocab is content-bounded, not corpus-bounded).
    */

  /** t03's full SELECT — reused verbatim as the t15 audit's inner
    * frame so the two oracles cannot drift apart. */
  private def t03Sql: String =
    s"""SELECT doc_id, lang AS actual_lang,
           | ${markerScoreSql(Seq("the", "a", "fast", "slow"))} AS score_en,
           | ${markerScoreSql(Seq("key", "value", "data"))} AS score_es,
           | ${markerScoreSql(Seq("table", "column", "row"))} AS score_fr,
           | ${markerScoreSql(Seq("stream", "batch", "spark"))} AS score_de,
           | CASE
           |  WHEN ${markerScoreSql(Seq("the", "a", "fast", "slow"))} = greatest(${markerScoreSql(Seq("the", "a", "fast", "slow"))}, ${markerScoreSql(Seq("key", "value", "data"))}, ${markerScoreSql(Seq("table", "column", "row"))}, ${markerScoreSql(Seq("stream", "batch", "spark"))}) THEN 'en'
           |  WHEN ${markerScoreSql(Seq("key", "value", "data"))} = greatest(${markerScoreSql(Seq("the", "a", "fast", "slow"))}, ${markerScoreSql(Seq("key", "value", "data"))}, ${markerScoreSql(Seq("table", "column", "row"))}, ${markerScoreSql(Seq("stream", "batch", "spark"))}) THEN 'es'
           |  WHEN ${markerScoreSql(Seq("table", "column", "row"))} = greatest(${markerScoreSql(Seq("the", "a", "fast", "slow"))}, ${markerScoreSql(Seq("key", "value", "data"))}, ${markerScoreSql(Seq("table", "column", "row"))}, ${markerScoreSql(Seq("stream", "batch", "spark"))}) THEN 'fr'
           |  ELSE 'de' END AS pred_lang
           |FROM documents""".stripMargin

  val oracle: Map[String, String] = Map(
    "t01" ->
      s"""SELECT doc_id,
         | len($toksSql)::INT AS n_tokens,
         | len(list_distinct($toksSql))::INT AS n_distinct,
         | floor(list_sum(list_transform($toksSql, t -> length(t)))::DOUBLE
         |       / len($toksSql) * 10000) / 10000 AS avg_token_len
         |FROM documents""".stripMargin,

    "t02" ->
      s"""SELECT doc_id,
         | floor((length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))::DOUBLE / length(text) * 10000) / 10000 AS alpha_ratio,
         | floor((length(text) - length(regexp_replace(text, '[ ]', '', 'g')))::DOUBLE / length(text) * 10000) / 10000 AS space_ratio,
         | floor(len(list_filter($toksSql, t -> t IN ('the', 'a')))::DOUBLE / len($toksSql) * 10000) / 10000 AS stopword_ratio,
         | floor(len(list_distinct($toksSql))::DOUBLE / len($toksSql) * 10000) / 10000 AS ttr,
         | floor(((length(text) - length(regexp_replace(text, '[a-z]', '', 'g')))::DOUBLE / length(text) * 0.3
         |   + (1.0 - len(list_filter($toksSql, t -> t IN ('the', 'a')))::DOUBLE / len($toksSql)) * 0.3
         |   + len(list_distinct($toksSql))::DOUBLE / len($toksSql) * 0.4) * 10000) / 10000 AS quality
         |FROM documents""".stripMargin,

    "t03" -> t03Sql,

    "t15" ->
      s"""WITH p AS ($t03Sql),
         |cell AS (
         |  SELECT actual_lang, pred_lang, count(*)::BIGINT AS n
         |  FROM p GROUP BY 1, 2),
         |tot AS (
         |  SELECT actual_lang, count(*)::BIGINT AS n_actual
         |  FROM p GROUP BY 1)
         |SELECT cell.actual_lang, cell.pred_lang, cell.n, tot.n_actual,
         |  round(cell.n / tot.n_actual, 4) AS frac
         |FROM cell JOIN tot USING (actual_lang)""".stripMargin,

    "t05" ->
      """SELECT doc_id,
        | array_to_string(list_filter(
        |   string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |   t -> t NOT IN ('the', 'a') AND t <> ''), ' ') AS clean_text,
        | len(list_filter(
        |   string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |   t -> t NOT IN ('the', 'a') AND t <> ''))::INT AS n_clean_tokens
        |FROM documents""".stripMargin,

    "t06" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 30) AS prefix FROM documents WHERE doc_id < 40)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | levenshtein(a.prefix, b.prefix)::INT AS edit_dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 20""".stripMargin,

    "t04" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok,
         |         generate_subscripts($toksSql, 1) AS pos
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
         |        || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS s
         |  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY lead(tok, 4) OVER w IS NOT NULL),
         |mh AS (
         |  SELECT doc_id, min(('0x' || substr(md5(s), 1, 8))::BIGINT) AS min_shingle_hash
         |  FROM sh GROUP BY doc_id)
         |SELECT d.doc_id,
         | substr(md5(text), 1, 16) AS md5_16,
         | ('0x' || substr(md5(text), 1, 8))::BIGINT AS fp32,
         | mh.min_shingle_hash
         |FROM documents d LEFT JOIN mh ON d.doc_id = mh.doc_id""".stripMargin,

    // range(0, n, stride) (stop-exclusive) == Spark sequence(0, n-1, stride)
    // (stop-inclusive); list[a:b] is 1-based inclusive and clamps like
    // Spark's slice.
    "t07" ->
      s"""WITH tk AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents),
         |pos AS (
         |  SELECT doc_id, toks,
         |    unnest(range(0, greatest(len(toks), 1), 24)) AS chunk_pos
         |  FROM tk)
         |SELECT doc_id, chunk_pos::INT AS chunk_pos,
         | len(toks[chunk_pos + 1 : chunk_pos + 32])::INT AS n_chunk_tokens,
         | md5(array_to_string(toks[chunk_pos + 1 : chunk_pos + 32], ' ')) AS chunk_md5
         |FROM pos""".stripMargin,

    "t08" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok,
         |         generate_subscripts($toksSql, 1) AS pos
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS s
         |  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY lead(tok, 2) OVER w IS NOT NULL)
         |SELECT doc_id, count(*)::BIGINT AS n_grams,
         | count(DISTINCT s)::BIGINT AS n_distinct,
         | floor((1 - count(DISTINCT s)::DOUBLE / count(*)) * 10000) / 10000
         |   AS rep_ratio
         |FROM sh GROUP BY doc_id""".stripMargin,

    "t09" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |v AS (
         |  SELECT tok, count(*)::BIGINT AS term_freq,
         |         count(DISTINCT doc_id)::BIGINT AS doc_freq
         |  FROM tk GROUP BY tok)
         |SELECT tok, term_freq, doc_freq,
         |  floor(ln((SELECT count(*) FROM documents)::DOUBLE / doc_freq)
         |        * 10000) / 10000 AS idf
         |FROM v ORDER BY term_freq DESC, tok ASC LIMIT 100""".stripMargin,

    "t10" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (
         |  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tk GROUP BY 1, 2),
         |dfq AS (
         |  SELECT tok, count(*)::BIGINT AS doc_freq FROM tf GROUP BY 1),
         |x AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, dfq.doc_freq,
         |    floor(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE
         |          / dfq.doc_freq) * 10000) / 10000 AS tfidf
         |  FROM tf JOIN dfq USING (tok)),
         |r AS (
         |  SELECT doc_id, tok, tf, doc_freq, tfidf,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tfidf DESC, tok ASC)::INT AS rank
         |  FROM x)
         |SELECT doc_id, tok, tf, doc_freq, tfidf, rank
         |FROM r WHERE rank <= 3""".stripMargin,

    "t11" -> {
      val scrub = Seq("spark", "hash", "merge").foldLeft("text") {
        (e, t) => s"regexp_replace($e, '\\b$t\\b', '[REDACTED]', 'g')"
      }
      s"""SELECT doc_id,
         | len(regexp_extract_all(text, '\\bspark\\b'))::INT AS n_spark,
         | len(regexp_extract_all(text, '\\bhash\\b'))::INT AS n_hash,
         | len(regexp_extract_all(text, '\\bmerge\\b'))::INT AS n_merge,
         | length($scrub)::INT AS scrub_len,
         | md5($scrub) AS scrub_md5
         |FROM documents""".stripMargin
    },

    "t12" -> {
      val planted = "text || ' contact u' || doc_id::VARCHAR || " +
        "'@mail.example.org office 10.' || (doc_id % 256)::VARCHAR || " +
        "'.0.1 card 4111111111111' || lpad((doc_id % 1000)::VARCHAR, 3, '0')"
      val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val ipRe = """\b(\d{1,3}\.){3}\d{1,3}\b"""
      val cardRe = """\b\d{13,16}\b"""
      val scrub = s"regexp_replace(regexp_replace(regexp_replace(($planted)," +
        s" '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g')," +
        s" '$cardRe', '<CARD>', 'g')"
      s"""SELECT doc_id,
         | len(regexp_extract_all($planted, '$emailRe'))::INT AS n_email,
         | len(regexp_extract_all($planted, '$ipRe'))::INT AS n_ip,
         | len(regexp_extract_all($planted, '$cardRe'))::INT AS n_card,
         | length($scrub)::INT AS scrub_len,
         | md5($scrub) AS scrub_md5
         |FROM documents""".stripMargin
    },

    "t13" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tot AS (SELECT count(*)::BIGINT AS n_total FROM tk),
         |cnt AS (SELECT tok, count(*)::BIGINT AS n_tok FROM tk GROUP BY tok)
         |SELECT tk.doc_id, count(*)::BIGINT AS n_tokens,
         |  sum(floor(ln(tot.n_total::DOUBLE / cnt.n_tok) * 10000)::BIGINT)::BIGINT
         |    AS nll_sum_e4,
         |  (sum(floor(ln(tot.n_total::DOUBLE / cnt.n_tok) * 10000)::BIGINT)
         |    // count(*))::BIGINT AS avg_nll_e4
         |FROM tk JOIN cnt USING (tok) CROSS JOIN tot
         |GROUP BY tk.doc_id""".stripMargin,

    "t14" ->
      s"""WITH tk AS (
         |  SELECT source, unnest($toksSql) AS tok FROM documents),
         |st AS (SELECT source, tok, count(*)::BIGINT AS cnt_s
         |       FROM tk GROUP BY 1, 2),
         |sn AS (SELECT source, sum(cnt_s)::BIGINT AS n_s FROM st GROUP BY 1),
         |ct AS (SELECT tok, sum(cnt_s)::BIGINT AS cnt FROM st GROUP BY 1),
         |tot AS (SELECT sum(cnt)::BIGINT AS n FROM ct)
         |SELECT st.source, min(n_s)::BIGINT AS n_tokens,
         |  count(*)::BIGINT AS vocab,
         |  sum(floor((cnt_s::DOUBLE / n_s)
         |        * ln((cnt_s::DOUBLE / n_s) / (cnt::DOUBLE / tot.n))
         |        * 100000000)::BIGINT)::BIGINT AS kl_e8
         |FROM st JOIN sn USING (source) JOIN ct USING (tok) CROSS JOIN tot
         |GROUP BY 1""".stripMargin,

    "t16" ->
      s"""WITH tk AS (
         |  SELECT unnest($toksSql) AS tok FROM documents),
         |fr AS (SELECT tok, count(*)::BIGINT AS freq FROM tk GROUP BY 1),
         |rk AS (
         |  SELECT freq,
         |    row_number() OVER (ORDER BY freq DESC, tok) AS rank
         |  FROM fr),
         |xy AS (
         |  SELECT floor(ln(rank::DOUBLE) * 10000)::BIGINT AS x,
         |    floor(ln(freq::DOUBLE) * 10000)::BIGINT AS y
         |  FROM rk),
         |s AS (
         |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         |    sum(x * x)::BIGINT AS sxx
         |  FROM xy)
         |SELECT n AS n_vocab,
         |  round((n * sxy - sx * sy)::DOUBLE
         |        / (n * sxx - sx * sx), 6) AS zipf_slope,
         |  round((sy::DOUBLE / n) / 10000, 4) AS mean_log_freq
         |FROM s""".stripMargin,

    "t17" ->
      s"""WITH tk AS (
         |  SELECT doc_id, unnest($toksSql) AS tok,
         |         generate_subscripts($toksSql, 1) AS pos
         |  FROM documents),
         |bg AS (
         |  SELECT tok || ' ' || lead(tok, 1) OVER w AS bg
         |  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
         |  QUALIFY lead(tok, 1) OVER w IS NOT NULL),
         |cnt AS (SELECT bg, count(*)::BIGINT AS c_xy FROM bg GROUP BY 1),
         |uni AS (SELECT tok, count(*)::BIGINT AS c_tok FROM tk GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS n_bg FROM bg),
         |top AS (SELECT bg, c_xy FROM cnt
         |        ORDER BY c_xy DESC, bg ASC LIMIT 30)
         |SELECT t.bg, t.c_xy, ux.c_tok AS c_x, uy.c_tok AS c_y,
         |  floor(ln(t.c_xy::DOUBLE * tot.n_bg / (ux.c_tok * uy.c_tok))
         |        * 10000)::BIGINT AS pmi_e4
         |FROM top t
         |JOIN uni ux ON ux.tok = string_split(t.bg, ' ')[1]
         |JOIN uni uy ON uy.tok = string_split(t.bg, ' ')[2]
         |CROSS JOIN tot""".stripMargin)
}
