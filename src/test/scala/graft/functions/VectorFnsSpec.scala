package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage of the vector-LSH primitives d11/s02 build on: the sliced
  * sign-bucket must equal an independent Scala reference (bit i set iff the
  * dim at slice-offset i is strictly positive), slices must be disjoint
  * views of the same vector, and md5Hash32Keyed must equal the Int-seed
  * form it generalizes.
  */
class VectorFnsSpec extends SparkSpec {
  import spark.implicits._

  private def refBucket(v: Seq[Float], start: Int, bits: Int): Long =
    (0 until bits).map(i => if (v(start + i) > 0f) 1L << i else 0L).sum

  test("signBucketSlice equals the independent reference on random vectors") {
    val rnd = new Random(7)
    val vecs = Seq.fill(50)(Seq.fill(64)(rnd.nextFloat() * 2 - 1f)) :+
      Seq.fill(64)(0f) :+ // all-zero: every bit clear (strict > 0)
      Seq.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)
    val df = vecs.toDF("v")
    for ((start, bits) <- Seq((0, 8), (8, 8), (16, 16), (48, 16), (0, 1))) {
      val got = df.select(VectorFns.signBucketSlice(col("v"), start, bits))
        .as[Long].collect().toSeq
      val want = vecs.map(refBucket(_, start, bits))
      assert(got == want, s"slice ($start, $bits)")
    }
  }

  test("signBucket is signBucketSlice at offset 0") {
    val v = Seq(Seq(0.5f, -1f, 2f, -0.1f, 0.3f, 1f, -2f, 0.01f)).toDF("v")
    val a = v.select(VectorFns.signBucket(col("v"), 8)).as[Long].head()
    val b = v.select(VectorFns.signBucketSlice(col("v"), 0, 8)).as[Long].head()
    assert(a == b && a == refBucket(Seq(0.5f, -1f, 2f, -0.1f, 0.3f, 1f, -2f, 0.01f), 0, 8))
  }

  test("md5Hash32Keyed(lit(seed), s) equals md5Hash32(s, seed)") {
    val df = Seq("alpha", "beta gamma", "").toDF("s")
    for (seed <- Seq(1, 3, 17)) {
      val keyed = df.select(TextFns.md5Hash32Keyed(lit(seed), col("s")))
        .as[Long].collect().toSeq
      val inted = df.select(TextFns.md5Hash32(col("s"), seed))
        .as[Long].collect().toSeq
      assert(keyed == inted, s"seed $seed")
    }
  }
}
