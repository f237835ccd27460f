package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native one-pass SimHash: value parity with the declarative explode +
  * md5Hash32 + 32-conditional-sum groupBy chain it replaced in d03/d08
  * (also the DuckDB oracle's formulation) — the brute-force oracle here
  * IS the old chain, evaluated through the same Spark column functions
  * the oracle SQL mirrors. */
class SimHashFSpec extends SparkSpec {
  import spark.implicits._

  /** The declarative simhash the expression must reproduce. */
  private def declarative(texts: Seq[String]): Map[Long, Long] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val tok = df.select(col("doc_id"),
        explode(TextFns.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), TextFns.md5Hash32(col("tok")).as("hv"))
    val bitVotes = (0 until 32).map { b =>
      val p = 1L << b
      sum(when((col("hv") / p).cast("long") % 2 === 1, 1).otherwise(-1)).as(s"v$b")
    }
    tok.groupBy(col("doc_id"))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def native(texts: Seq[String]): Map[Long, Long] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    df.select(col("doc_id"), TextFns.simhashNative(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
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
    val rnd = new scala.util.Random(20260813L)
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

  test("matches the HOF reference formulation too") {
    val texts = Seq("a b c d", "dup dup x", "")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hof = df.select(col("doc_id"),
        TextFns.simHash32(TextFns.tokens(col("text"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native(texts) == hof)
  }

  test("participates in whole-stage codegen (no fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(TextFns.simhashNative(col("text")).as("h"))
    q.collect()
    val s = q.queryExecution.executedPlan.toString
    assert(s.contains("*(1)"), s)
  }
}
