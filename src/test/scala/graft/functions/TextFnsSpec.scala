package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage of the portable text primitives, including the array-HOF
  * simhash/minhash forms (the queries use the explode forms for speed; both
  * must agree). */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("md5Hash32 of 'abc' is the cross-engine constant") {
    val v = Seq("abc").toDF("s")
      .select(TextFns.md5Hash32(col("s"))).as[Long].head()
    assert(v == 2416005272L) // == DuckDB ('0x'||substr(md5('abc'),1,8))::BIGINT
  }

  test("md5Hash60 matches the cross-engine constant, the composed conv " +
      "chain, and stays in [0, 2^60)") {
    val v = Seq("abc").toDF("s")
      .select(TextFns.md5Hash60(col("s"))).as[Long].head()
    // == DuckDB ('0x'||substr(md5('abc'),1,15))::BIGINT
    assert(v == 648541476951500027L)
    // the declarative form the expression replaces, over varied inputs
    val inputs = Seq("", " ", "a b c", "über 漢字", "x" * 500)
    val both = inputs.toDF("s").select(
        TextFns.md5Hash60(col("s")).as("native"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    both.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 60)))
  }

  test("shingles: sliding windows; fewer than k tokens yields empty") {
    val out = Seq("a b c d", "a b", "  x  y  z  ").toDF("text")
      .select(TextFns.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq("x y z")) // trim + \s+ tokenization
  }

  test("jaccard: exact rational on distinct sets, 0 on empty union") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TextFns.jaccard(col("x"), col("y"))).as[Double].head()
    assert(j == 2.0 / 4.0)
    val e = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
      .select(TextFns.jaccard(col("x"), col("y"))).as[Double].head()
    assert(e == 0.0)
  }

  test("simHash32 HOF form agrees with the explode-form computation") {
    val docs = Seq("spark stream batch spark", "the a key value data row")
    val hof = docs.toDF("text")
      .select(TextFns.simHash32(TextFns.tokens(col("text")))).as[Long].collect()
    // manual reference: per-bit +/- votes over md5Hash32(token)
    docs.zip(hof).foreach { case (text, got) =>
      val toks = text.trim.split("\\s+")
      val hashes = toks.map { t =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
        md.take(4).foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
      }
      val expected = (0 until 32).map { b =>
        val ones = hashes.count(h => ((h >> b) & 1) == 1)
        if (ones * 2 > toks.length) 1L << b else 0L
      }.sum
      assert(got == expected, s"text='$text'")
    }
  }

  test("charClassRatio and tokenSetRatio handle boundaries") {
    val df = Seq("ab c1").toDF("text")
    val alpha = df.select(TextFns.charClassRatio(col("text"), "[a-z]"))
      .as[Double].head()
    assert(alpha == 3.0 / 5.0)
    val stop = df.select(
      TextFns.tokenSetRatio(TextFns.tokens(col("text")), Seq("ab")))
      .as[Double].head()
    assert(stop == 0.5)
  }
}
