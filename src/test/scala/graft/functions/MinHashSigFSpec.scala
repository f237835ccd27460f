package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native one-pass MinHash signature: value parity with the declarative
  * explode + md5Hash32 + groupBy chain it replaced in d02 (which is also
  * the DuckDB oracle's formulation), across adversarial tokenization
  * shapes — the brute-force oracle here IS the old chain, evaluated
  * through the same Spark column functions the oracle SQL mirrors. */
class MinHashSigFSpec extends SparkSpec {
  import spark.implicits._

  private val nBands = 6

  /** The declarative signature the expression must reproduce:
    * explode(array_distinct(shingles)) -> md5Hash32 -> groupBy count +
    * band minima. Returns (doc_id -> (c, mh1..mh6)). */
  private def declarative(texts: Seq[String]): Map[Long, Seq[Long]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val shd = df.select(col("doc_id"),
      explode(array_distinct(TextFns.shingles(col("text"), 3))).as("s"))
    val hs = shd.select(col("doc_id"), TextFns.md5Hash32(col("s")).as("h"))
    val bandMins = (1 to nBands).map { b =>
      min((col("h") * lit(1000003L + b * 7919L) + lit(b * 104729L)) %
        lit(2147483647L)).as(s"mh$b")
    }
    hs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("c"), bandMins: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to nBands + 1).map(r.getLong))
      .toMap
  }

  private def native(texts: Seq[String]): Map[Long, Option[Seq[Long]]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    df.select(col("doc_id"), TextFns.minhashSig(col("text")).as("sig"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1))))
      .toMap
  }

  test("hand-picked tokenization edges match the declarative chain") {
    val texts = Seq(
      "a b c d e",                       // plain
      "a b c",                           // exactly one shingle
      "a b",                             // too few tokens -> null / no rows
      "",                                // empty
      "   ",                             // spaces only: trim -> "" -> [""]
      "\t\na b c d",                     // leading non-space whitespace
      "a  b\tc\nd",                      // mixed separators inside
      "x x x x x x",                     // duplicate shingles collapse
      "über ño 漢字 emoji🙂 done",        // multi-byte UTF-8
      "a b c a b c a b c d"              // repeats + fresh tail
    )
    val expect = declarative(texts)
    val got = native(texts)
    texts.indices.foreach { i =>
      val id = i.toLong
      (expect.get(id), got(id)) match {
        case (None, None) => // explode emitted no rows, expression null
        case (Some(e), Some(g)) => assert(e == g, s"doc $id: $e vs $g")
        case (e, g) => fail(s"doc $id: declarative=$e native=$g")
      }
    }
  }

  test("random documents: expression == declarative chain (property)") {
    val rnd = new scala.util.Random(20260813L)
    val vocab = Array("a", "b", "ab", "ü", "漢", "x1", "word", "Z9",
      "emoji🙂", "longer-token")
    val seps = Array(" ", "  ", "\t", " \n", "  ")
    def doc(): String = {
      val n = rnd.nextInt(13)
      (0 until n).map { i =>
        vocab(rnd.nextInt(vocab.length)) +
          (if (i < n - 1) seps(rnd.nextInt(seps.length)) else "")
      }.mkString
    }
    (0 until 20).foreach { round =>
      val texts = Seq.fill(12)(doc())
      val expect = declarative(texts)
      val got = native(texts)
      texts.indices.foreach { i =>
        val id = i.toLong
        assert(expect.get(id) == got(id),
          s"round $round doc $id '${texts(i)}': ${expect.get(id)} vs ${got(id)}")
      }
    }
  }

  test("participates in whole-stage codegen (no fallback)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(TextFns.minhashSig(col("text")).as("sig"))
    q.collect()
    val s = q.queryExecution.executedPlan.toString
    assert(s.contains("*(1)"), s)
  }
}
