package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions.{datediff, floor, lit}

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

  test("randomized: union-window result equals brute-force per-row lookup") {
    val rnd = new scala.util.Random(42)
    val leftRows = (1 to 300).map { i =>
      (rnd.nextInt(5), new java.sql.Date(86400000L * rnd.nextInt(1000)), i)
    }
    val rightRows = (1 to 200).map { j =>
      (rnd.nextInt(5), new java.sql.Date(86400000L * rnd.nextInt(1000)), s"p$j")
    }
    val left = leftRows.toDF("k", "lt", "lid")
    val right = rightRows.toDF("k", "rt", "payload")

    val got = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", "left",
        tieBreak = Seq("payload"))
      .select("lid", "payload").as[(Int, Option[String])].collect().toMap

    leftRows.foreach { case (k, lt, lid) =>
      val candidates = rightRows.filter(r => r._1 == k && !r._2.after(lt))
      val expected =
        if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2.getTime, r._3))._3)
      assert(got(lid) == expected, s"lid=$lid k=$k lt=$lt")
    }
  }

  test("bucketed variant: identical result to plain backward (randomized)") {
    // low-cardinality key (2 values) x wide time range — the exact shape
    // where the plain window would funnel the fact side into 2 partitions
    val rnd = new scala.util.Random(7)
    val left = (1 to 400).map { i =>
      (rnd.nextInt(2), new java.sql.Date(86400000L * rnd.nextInt(2000)), i)
    }.toDF("k", "lt", "lid")
    val right = (1 to 150).map { j =>
      (rnd.nextInt(2), new java.sql.Date(86400000L * rnd.nextInt(2000)), s"p$j")
    }.toDF("k", "rt", "payload")
    // ~90-day buckets over dates, monotone in time
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      floor(datediff(c, lit("1970-01-01")) / 90)

    val plain = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt", "left",
      tieBreak = Seq("payload"))
    val bucketed = AsOfJoin.backwardBucketed(left, right, Seq("k"), "lt", "rt",
      bucketOf, "left", tieBreak = Seq("payload"))
    val p = plain.orderBy("lid").collect()
    val b = bucketed.orderBy("lid").collect()
    assert(p.sameElements(b))

    // the fact-side window shuffle is keyed by (k, bucket), not k alone —
    // partitions stay bounded no matter how big one key grows
    val plan = bucketed.queryExecution.executedPlan.toString
    val windowPartitionings = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("windowspecdefinition"))
      .toSeq
    assert(windowPartitionings.exists(l => l.contains("__b")),
      s"expected a window partitioned by __b:\n${windowPartitionings.mkString("\n")}")
  }

  test("reserved internal column names are rejected up front") {
    val left = Seq((1, d("2024-01-10"), "x")).toDF("k", "lt", "__tag")
    val right = Seq((1, d("2024-01-01"), "m")).toDF("k", "rt", "payload")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "lt", "rt")
    }
    assert(e.getMessage.contains("__tag"))
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
