package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def resolveMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.resolve(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("components get min-member labels; disjoint sets stay apart") {
    val m = resolveMap(Seq((1L, 2L), (2L, 3L), (7L, 9L), (9L, 8L), (20L, 21L)))
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges (pointer jumping beats one-hop rounds)") {
    // a 200-node path: one-hop propagation would need 200 rounds, far past
    // maxIter; pointer jumping needs ~log2(200) ≈ 8.
    val chain = (0L until 199L).map(i => (i, i + 1))
    val m = resolveMap(chain)
    assert(m.size == 200 && m.values.forall(_ == 0L))
  }

  test("cycles and duplicate/reversed edges don't wedge convergence") {
    val m = resolveMap(Seq((5L, 6L), (6L, 7L), (7L, 5L), (6L, 5L), (5L, 6L)))
    assert(m == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("self-loops are harmless") {
    val m = resolveMap(Seq((4L, 4L), (4L, 2L)))
    assert(m == Map(2L -> 2L, 4L -> 2L))
  }

  test("hitting the iteration cap fails loudly instead of returning stale labels") {
    val chain = (0L until 50L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.resolve(chain.toDF("a", "b"), "a", "b", maxIter = 2)
        .collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("superseded rounds are unpersisted; only the result frame stays") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val out = ConnectedComponents.resolve(
      (0L until 40L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b")
    out.count()
    // one surviving label frame (the returned one); everything else —
    // edges, half, superseded rounds — must be gone
    val left = spark.sparkContext.getPersistentRDDs.size
    assert(left <= 2, s"expected only the result's checkpoint blocks, found $left")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
