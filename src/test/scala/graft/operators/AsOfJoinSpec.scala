package graft.operators

import java.sql.Date

import graft.SparkSpec

/** As-of join semantics: nearest preceding match, ties, misses, tie-break
  * determinism (SURVEY §2.3 J2; never selects a future-dated right row). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("backward as-of picks nearest preceding right row per key") {
    val left = Seq(
      (1, d("2024-01-15"), "a"),
      (1, d("2024-02-15"), "b"),
      (2, d("2024-01-15"), "c")
    ).toDF("k", "lt", "tag")
    val right = Seq(
      (1, d("2024-01-01"), "m1"),
      (1, d("2024-02-01"), "m2"),
      (1, d("2024-03-01"), "m3"), // future for every left row
      (2, d("2024-06-01"), "m4") // future -> key 2 has no match
    ).toDF("k", "rt", "payload")

    val out = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", "left")
      .select("tag", "payload").as[(String, Option[String])].collect().toMap
    assert(out("a").contains("m1"))
    assert(out("b").contains("m2"))
    assert(out("c").isEmpty)

    val inner = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", "inner")
    assert(inner.count() == 2)
  }

  test("equal timestamps match (<=) and tieBreak picks greatest") {
    val left = Seq((1, d("2024-01-10"), "x")).toDF("k", "lt", "tag")
    val right = Seq(
      (1, d("2024-01-10"), "tie-low"),
      (1, d("2024-01-10"), "tie-high")
    ).toDF("k", "rt", "payload")
    val out = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", "inner",
      tieBreak = Seq("payload"))
    assert(out.select("payload").as[String].head() == "tie-low") // "tie-low" > "tie-high" lexicographically
  }
}
