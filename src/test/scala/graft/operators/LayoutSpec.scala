package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed co-located joins (exchange-free plan) and salted skew joins
  * (identical results to the direct join). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without any Exchange") {
    // a previous crashed run can leave the managed location on disk while
    // the catalog entry is gone — clear both
    Seq("li_bkt", "or_bkt").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Bucketing.writeBucketed(
      li.withColumnRenamed("l_orderkey", "k"), "li_bkt", Seq("k"), 8, Seq("k"))
    Bucketing.writeBucketed(
      or.withColumnRenamed("o_orderkey", "k"), "or_bkt", Seq("k"), 8, Seq("k"))
    // at this toy size the planner prefers broadcast (and rightly disables
    // bucketed reads); force the sort-merge path the layout exists for
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bkt", "or_bkt", Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")
      assert(plan.contains("Bucketed: true"), plan.take(2000))
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("salted join returns exactly the plain join's rows under skew") {
    // one hot key (0) carrying most rows
    val big = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 50 else 0L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((0L, "hot"), (1L, "a"), (10L, "b"), (40L, "c")).toDF("k", "name")
    val direct = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), col("payload"), nSalts = 8)
      .select("k", "payload", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == direct)
    assert(salted.nonEmpty)
  }

  test("salted left join preserves unmatched big-side rows") {
    val big = Seq((1L, 10L), (2L, 20L)).toDF("k", "payload")
    val small = Seq((1L, "x")).toDF("k", "name")
    val out = SkewJoin.saltedJoin(big, small, Seq("k"), col("payload"), 4, "left")
      .select("k", "name").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("x") && out(2L).isEmpty)
  }
}
