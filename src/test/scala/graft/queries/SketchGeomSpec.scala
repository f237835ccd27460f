package graft.queries

import org.apache.spark.sql.DataFrame

import graft.{SparkEntry, SparkSpec}

/** The sketch-geometry confs (spark.graft.x04.k / x07.m / x08.rows, new
  * after the accuracy ladder measured the fixed geometries' ceilings):
  * defaults must reproduce the committed oracle behavior bit-for-bit,
  * malformed values must fail with the key name (the intConf contract),
  * and the documented re-sizing semantics must hold — in particular the
  * two EXACTNESS escapes (KMV with k ≥ vocabulary is exact; a bitmap
  * well above the vocabulary estimates within LC's small-load error).
  */
class SketchGeomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(q: String): DataFrame = SparkEntry.queries(q)(spark, sf)

  private def withConf[T](key: String, v: String)(f: => T): T = {
    spark.conf.set(key, v)
    try f finally spark.conf.unset(key)
  }

  test("defaults are conf-default parity: explicit default == unset, " +
      "for all three knobs") {
    val plain = (run("x04").collect().toSeq, run("x07").collect().toSeq,
      run("x08").collect().toSeq)
    val explicit = withConf("spark.graft.x04.k", "64") {
      withConf("spark.graft.x07.m", "4096") {
        withConf("spark.graft.x08.rows", "16") {
          (run("x04").collect().toSeq, run("x07").collect().toSeq,
            run("x08").collect().toSeq)
        }
      }
    }
    assert(plain == explicit)
  }

  test("x04: k >= vocabulary takes the exact path (est == n_exact), " +
      "k below it estimates with the k-cut") {
    val exact = withConf("spark.graft.x04.k", "100000") {
      val r = run("x04").head()
      assert(r.getAs[Long]("est_distinct") == r.getAs[Long]("n_exact"))
      r.getAs[Long]("n_exact")
    }
    withConf("spark.graft.x04.k", "4") {
      val r = run("x04").head()
      assert(r.getAs[Long]("k_obs") == 4L)
      val est = r.getAs[Long]("est_distinct")
      // k=4 is a sigma ~ 70% estimator — only sanity-bound it
      assert(est > 0L && est < exact * 20)
    }
  }

  test("x05 shares x04's k (one common k or the union sketch cannot " +
      "compose)") {
    withConf("spark.graft.x04.k", "8") {
      assert(run("x05").head().getAs[Long]("k_obs") <= 8L)
    }
  }

  test("x07: a bitmap far above the vocabulary estimates within small-load " +
      "LC error; a degenerate tiny bitmap saturates to the NULL contract") {
    withConf("spark.graft.x07.m", "1048576") {
      val r = run("x07").head()
      val est = r.getAs[Double]("est_distinct")
      val ex = r.getAs[Long]("n_exact")
      assert(math.abs(est / ex - 1) < 0.05,
        s"m=2^20 at tiny vocab should be near-exact: est=$est exact=$ex")
    }
    withConf("spark.graft.x07.m", "2") {
      val r = run("x07").head()
      assert(r.isNullAt(r.fieldIndex("est_distinct")),
        "occupied == m must yield the documented NULL, never ±inf")
    }
  }

  test("x08: rows re-sizes the sketch (r_rows reflects it) and rel_err " +
      "stays consistent with est/exact") {
    withConf("spark.graft.x08.rows", "64") {
      val r = run("x08").head()
      assert(r.getAs[Int]("r_rows") == 64)
      val (est, ex) = (r.getAs[Long]("est_f2"), r.getAs[Long]("exact_f2"))
      val rel = r.getAs[Double]("rel_err")
      // est_f2 is the floored division of the same sum rel_err divides
      // exactly — agreement within the floor+rounding slack
      assert(math.abs(est.toDouble / ex - 1 - rel) < 1e-3)
    }
  }

  test("malformed or out-of-floor geometry confs fail with the key name") {
    Seq(("spark.graft.x04.k", "abc", "x04"),
      ("spark.graft.x07.m", "4k", "x07"),
      ("spark.graft.x08.rows", "many", "x08")).foreach { case (key, v, q) =>
      val e = intercept[IllegalArgumentException] {
        withConf(key, v)(run(q).collect())
      }
      assert(e.getMessage.contains(key), s"$key: ${e.getMessage}")
    }
    Seq(("spark.graft.x04.k", "1", "x04"),
      ("spark.graft.x07.m", "0", "x07"),
      ("spark.graft.x08.rows", "0", "x08")).foreach { case (key, v, q) =>
      val e = intercept[IllegalArgumentException] {
        withConf(key, v)(run(q).collect())
      }
      assert(e.getMessage.contains(key) && e.getMessage.contains(">="),
        s"$key: ${e.getMessage}")
    }
  }
}
