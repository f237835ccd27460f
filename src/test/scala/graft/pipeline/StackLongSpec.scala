package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The long-format stacking path agrees with the ArrayStats aggregator. */
class StackLongSpec extends SparkSpec {
  import spark.implicits._

  test("ragged groups fail loudly on both stacking paths") {
    val df = Seq(
      ("g", Array.fill(16)(1f)),
      ("g", Array.fill(8)(1f))).toDF("grp", "img")
    val e = intercept[Exception] {
      StackLong.toArrays(
        StackLong.pixelStats(StackLong.toLong(df, Seq("grp"), "img"), Seq("grp")),
        Seq("grp")).collect()
    }
    assert(e.getMessage.contains("share a shape"), e.getMessage)
  }

  test("long-format pixel stats match ArrayStats per element") {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- Seq("g1", "g2")
      _ <- 1 to 5
    } yield (g, Array.fill(16)(rnd.nextFloat() * 100f))
    val df = rows.toDF("grp", "img")

    // array path
    val arrayRes = df.groupBy($"grp")
      .agg(udaf(new ArrayStats.ArrayStatsAggregator()).apply($"img").as("st"))
      .select($"grp", $"st.n", $"st.mean", $"st.std", $"st.sem")
      .as[(String, Long, Seq[Double], Seq[Double], Seq[Double])]
      .collect().map(r => r._1 -> r).toMap

    // long path
    val longRes = StackLong.toArrays(
        StackLong.pixelStats(StackLong.toLong(df, Seq("grp"), "img"), Seq("grp")),
        Seq("grp"))
      .select($"grp", $"n", $"mean", $"std", $"sem")
      .as[(String, Long, Seq[Double], Seq[Double], Seq[Double])]
      .collect().map(r => r._1 -> r).toMap

    Seq("g1", "g2").foreach { g =>
      val (_, na, ma, sa, ea) = arrayRes(g)
      val (_, nl, ml, sl, el) = longRes(g)
      assert(na == 5 && nl == 5)
      ma.zip(ml).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      sa.zip(sl).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
      ea.zip(el).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }
}
