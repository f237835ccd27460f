package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Wall behavior of the d20 ENSEMBLE when its d04 leg's salted escape
  * actually engages on a skewed corpus (VERDICT r19 #3).
  *
  * d20's output parity under salt on/off is plan-tested at sf0.001
  * (PlanSpec "d20 composition"), but the ensemble is the operator a user
  * actually ships, and its d04 leg shares the corpus scan with the d02
  * and d08 legs — so the question is whether the engaged escape's cost
  * stays the d04-local delta or compounds through the union. Interleaved
  * salted/plain inside one warmed session on a skew-amplified corpus
  * (make_skew_probe.py), rotated order per rep (positional-bias lesson
  * from D04BarrierProbe), identical row counts required.
  *
  * Run: sbt "Test/runMain graft.probe.D20SkewProbe DIR [reps] [nSalts] [hotMin]"
  */
object D20SkewProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val nSalts = args.lift(2).map(_.toInt).getOrElse(32)
    val hotMin = args.lift(3).map(_.toInt).getOrElse(1024)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(mode: String): (Long, Double) = {
      if (mode == "salted") {
        spark.conf.set("spark.graft.d04.salt", nSalts.toString)
        spark.conf.set("spark.graft.d04.salt.hotMin", hotMin.toString)
      } else {
        spark.conf.unset("spark.graft.d04.salt")
        spark.conf.unset("spark.graft.d04.salt.hotMin")
      }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d20")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n, sec)
    }

    val (nw, tw) = run("plain")
    println(f"D20SKEW dir=$dir warmup plain rows=$nw wall=$tw%.1f s")
    var nRef = nw
    val modes = Seq("salted", "plain")
    for (r <- 1 to reps; mode <- {
      val k = (r - 1) % modes.length; modes.drop(k) ++ modes.take(k)
    }) {
      val (n, sec) = run(mode)
      require(n == nRef, s"row count moved: $n vs $nRef ($mode)")
      nRef = n
      println(f"D20SKEW dir=$dir rep=$r mode=$mode%-6s nSalts=$nSalts " +
        f"hotMin=$hotMin rows=$n wall=$sec%.1f s")
    }
    spark.stop()
  }
}
