package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native one-pass 64-bit two-half SimHash: value parity with the
  * declarative explode + two-md5-hex-slice + 64-conditional-sum groupBy
  * chain it stands in for in d03/d08/d20 (also the DuckDB oracle's
  * formulation) — the brute-force oracle here IS that chain, evaluated
  * through the same Spark column functions the oracle SQL mirrors:
  * `conv(substring(md5(tok), 1, 8), 16, 10)` votes the hi half,
  * `conv(substring(md5(tok), 9, 8), 16, 10)` the lo half. */
class SimHash64FSpec extends SparkSpec {
  import spark.implicits._

  /** The declarative two-half simhash the expression must reproduce. */
  private def declarative(texts: Seq[String]): Map[Long, (Long, Long)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tok = df.select(col("doc_id"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("hh"),
        conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long").as("hl"))
    val bitVotes = (0 until 32).flatMap { b =>
      val p = 1L << b
      Seq(
        sum(when((col("hh") / p).cast("long") % 2 === 1, 1).otherwise(-1)).as(s"vh$b"),
        sum(when((col("hl") / p).cast("long") % 2 === 1, 1).otherwise(-1)).as(s"vl$b"))
    }
    tok.groupBy(col("doc_id"))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b => when(col(s"vh$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("hi"),
        (0 until 32).map(b => when(col(s"vl$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("lo"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  private def native(texts: Seq[String]): Map[Long, (Long, Long)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    df.select(col("doc_id"), TextFns.simhash64Native(col("text")).as("sh"))
      .select(col("doc_id"), col("sh").getItem(0).as("hi"),
        col("sh").getItem(1).as("lo"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("hand-picked tokenization edges match the declarative chain") {
    val texts = Seq(
      "a b c d e",
      "one-token",
      "",                         // empty: single "" token votes
      "   ",                      // whitespace-only: same single "" token
      "\t\nx y",                  // leading non-space whitespace
      "x  y\tz\nw",               // mixed separators
      "dup dup dup uniq",         // duplicate weighting matters
      "über ño 漢字 emoji🙂"      // multi-byte UTF-8
    )
    assert(native(texts) == declarative(texts))
  }

  test("random documents: expression == declarative chain (property)") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("a", "b", "ab", "ü", "漢", "x1", "word", "Z9",
      "emoji🙂", "longer-token")
    val seps = Array(" ", "  ", "\t", " \n")
    def doc(): String = {
      val n = rnd.nextInt(10)
      (0 until n).map { i =>
        vocab(rnd.nextInt(vocab.length)) +
          (if (i < n - 1) seps(rnd.nextInt(seps.length)) else "")
      }.mkString
    }
    (0 until 20).foreach { round =>
      val texts = Seq.fill(12)(doc())
      assert(native(texts) == declarative(texts), s"round $round: $texts")
    }
  }

  test("hi half equals the 32-bit SimHashF (same hex chars 1-8 votes)") {
    // the hi half votes over exactly the hash SimHashF votes over, so the
    // two expressions must agree bit for bit — a cross-check that neither
    // drifted from the shared TextHash core
    val texts = Seq("a b c d", "dup dup x", "", "über ño 漢字")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
        TextFns.simhashNative(col("text")).as("h32"),
        TextFns.simhash64Native(col("text")).getItem(0).as("hi"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("halves stay in [0, 2^32) — BIGINT-safe in the oracle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = docs.select(TextFns.simhash64Native(col("text")).as("sh"))
      .select(col("sh").getItem(0).as("hi"), col("sh").getItem(1).as("lo"))
      .filter(col("hi") < 0 || col("hi") > 4294967295L ||
        col("lo") < 0 || col("lo") > 4294967295L)
      .count()
    assert(bad == 0)
  }

  test("participates in whole-stage codegen (no fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(TextFns.simhash64Native(col("text")).as("h"))
    q.collect()
    val s = q.queryExecution.executedPlan.toString
    assert(s.contains("*(1)"), s)
  }
}
