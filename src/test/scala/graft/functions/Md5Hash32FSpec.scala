package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native 32-bit md5-prefix hash: value parity with the composed
  * `conv(substring(md5(s), 1, 8), 16, 10)` chain it replaced — which is
  * also the DuckDB oracle formulation
  * (`('0x'||substr(md5(s),1,8))::BIGINT`) — across adversarial string
  * shapes and in every calling position (projection, HOF lambda,
  * filter). */
class Md5Hash32FSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  test("hand-picked shapes: native == composed chain (and nulls propagate)") {
    val df = Seq(
      Some(""), Some(" "), Some("a"), Some("hello world"),
      Some("0"), Some("\t tab \n newline"), Some("héllo wörld ünïcode"),
      Some("日本語のテキスト"), Some("emoji 😀 text"),
      Some("x" * 10000), None)
      .toDF("s")
    val out = df.select(
      TextFns.md5Hash32(col("s")).as("native"),
      composed(col("s")).as("chain")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null propagation diverged: $r")
      if (!r.isNullAt(0))
        assert(r.getLong(0) == r.getLong(1), s"value diverged: $r")
    }
    // seeded + keyed variants keep the portable prefix contract
    val seeded = Seq("abc").toDF("s").select(
      TextFns.md5Hash32(col("s"), seed = 7).as("native"),
      composed(concat(lit("7:"), col("s"))).as("chain"),
      TextFns.md5Hash32Keyed(lit(3), col("s")).as("knative"),
      composed(concat(lit("3:"), col("s"))).as("kchain")).head()
    assert(seeded.getLong(0) == seeded.getLong(1))
    assert(seeded.getLong(2) == seeded.getLong(3))
  }

  test("property: random unicode strings hash identically through the " +
      "native expression, including inside a HOF lambda") {
    val rnd = new scala.util.Random(3211)
    def randStr(): String =
      if (rnd.nextBoolean()) rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      else (0 until rnd.nextInt(12))
        .map(_ => (0x20 + rnd.nextInt(0x2FDF)).toChar).mkString
    val ss = Seq.fill(400)(randStr())
    val df = ss.toDF("s")
    val direct = df.select(TextFns.md5Hash32(col("s")).as("n"),
      composed(col("s")).as("c")).collect()
    direct.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    // HOF-lambda position: interpreted eval path of the expression
    val hof = df.select(
      transform(array(col("s")), x => TextFns.md5Hash32(x)).as("n"),
      transform(array(col("s")), x => composed(x)).as("c")).collect()
    hof.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("range contract: values are unsigned 32-bit") {
    val vs = Seq("a", "b", "c", "d", "e", "f", "g", "h").toDF("s")
      .select(TextFns.md5Hash32(col("s")).as("h")).as[Long].collect()
    assert(vs.forall(v => v >= 0L && v <= 0xFFFFFFFFL))
  }
}
