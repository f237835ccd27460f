package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native token count: value parity with `size(split(trim(text), "\s+"))`
  * — the composed chain it replaced in the counting-only call sites,
  * which is also the DuckDB oracle formulation
  * (`len(regexp_split_to_array(trim(text), '\s+'))`) — across the regex's
  * edge shapes: empty-field emission at non-space-whitespace boundaries,
  * the 0x20-only trim, ASCII-only `\s`, and unicode content. */
class TokenCountFSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    size(split(trim(c), "\\s+"))

  test("hand-picked regex edges match the composed chain exactly") {
    val shapes = Seq(
      Some(""), Some(" "), Some("   "), Some("a"), Some("a b"),
      Some("a  b"), Some(" a b "), // 0x20 trim strips these
      Some("\ta b"), Some("a b\t"), Some("\t"), Some("\t\t"),
      Some("\na\r\nb"), Some("a\fb"),
      Some("\u00A0"), Some("a\u00A0b"), // NBSP is NOT \\s: token content
      Some("héllo wörld"), Some("日本語 テキスト"), Some("😀 😀"),
      Some("x" * 5000 + " " + "y" * 5000), None)
    val out = shapes.toDF("s").select(
      TextFns.tokenCount(col("s")).as("native"),
      composed(col("s")).as("chain"),
      col("s")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null propagation: $r")
      if (!r.isNullAt(0))
        assert(r.getInt(0) == r.getInt(1),
          s"count diverged for ${Option(r.getString(2))}: " +
            s"native ${r.getInt(0)} vs chain ${r.getInt(1)}")
    }
  }

  test("property: random mixed whitespace/content strings count " +
      "identically (seeded, 600 cases)") {
    val rnd = new scala.util.Random(4177)
    val wsChars = Array(' ', '\t', '\n', '\u000B', '\f', '\r')
    def randStr(): String = (0 until rnd.nextInt(40)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => wsChars(rnd.nextInt(wsChars.length))
        case 1 => ('a' + rnd.nextInt(26)).toChar
        case 2 => (0xA0 + rnd.nextInt(0x2F00)).toChar // unicode content
        case _ => ('0' + rnd.nextInt(10)).toChar
      }
    }.mkString
    val ss = Seq.fill(600)(randStr())
    val out = ss.toDF("s").select(
      TextFns.tokenCount(col("s")).as("native"),
      composed(col("s")).as("chain"), col("s")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"diverged for ${r.getString(2).map(c => f"\\u${c.toInt}%04x").mkString}"))
  }
}
