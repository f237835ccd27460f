package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-22 re-attempt of q25's formulation (VERDICT r21 #7): the
  * percentile() hash-map aggregate (one scan, per-group value→count maps
  * sized by DISTINCT values) vs the two-pass exact-rank selection
  * (operators/ExactPercentile — value-identical by its property spec).
  * Interleaved min-of-N. History: the r20 ×100 probe measured
  * rank-selection 8.58 s vs 1.77 s for the aggregate on this
  * low-cardinality TPC-H price/quantity data — this probe re-derives that
  * verdict on the current binary at any rung.
  *
  * Run: sbt "Test/runMain graft.probe.Q25AbProbe DIR [reps]"
  */
object Q25AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def aggForm = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), array(lit(0.5), lit(0.9))).as("pp"),
        round(percentile(col("l_quantity"), lit(0.25)), 4).as("p25_qty"))
      .select(col("l_returnflag"),
        round(element_at(col("pp"), 1), 4).as("p50_price"),
        round(element_at(col("pp"), 2), 4).as("p90_price"),
        col("p25_qty"))

    def rankForm = {
      val li = Tables.load(spark, dir, "lineitem")
      val price = graft.operators.ExactPercentile.of(
        li, "l_returnflag", col("l_extendedprice"),
        Seq("p50_price" -> 0.5, "p90_price" -> 0.9))
      val qty = graft.operators.ExactPercentile.of(
        li, "l_returnflag", col("l_quantity"), Seq("p25_qty" -> 0.25))
      price.join(qty, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          round(col("p50_price"), 4).as("p50_price"),
          round(col("p90_price"), 4).as("p90_price"),
          round(col("p25_qty"), 4).as("p25_qty"))
    }

    // value parity first — a speed win that changes q25's bytes is void
    val a = aggForm.collect().map(_.toString).sorted.toSeq
    val b = rankForm.collect().map(_.toString).sorted.toSeq
    println(s"[q25ab] parity=${a == b}" +
      (if (a != b) s" agg=$a rank=$b" else ""))

    val results = (1 to reps).flatMap { _ =>
      Seq("agg" -> {
        val t0 = System.nanoTime()
        aggForm.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }, "rank" -> {
        val t0 = System.nanoTime()
        rankForm.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      })
    }
    results.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (m, rs) =>
      val ts = rs.map(_._2)
      println(f"[q25ab] $m%-4s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
