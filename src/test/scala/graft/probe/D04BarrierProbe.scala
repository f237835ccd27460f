package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Attribution probe for the engaged-salt overhead (VERDICT r19 #1):
  * WHERE do the extra seconds go when d04's salted escape actually
  * routes hot keys?
  *
  * Candidate components, isolated by `spark.graft.d04.salt.barrier`:
  *  - `observe` (the r18 shipped barrier): CollectMetricsExec has no
  *    CodegenSupport in Spark 4.1.2, so the barrier forces a
  *    row-at-a-time boundary on the full salt-exploded stream between
  *    the shared exchange and the a-side filter/join;
  *  - `expr` (PushdownBarrierF): same plan topology — ONE shared
  *    exchange, filter above it — but the whole span stays inside
  *    WholeStageCodegen. observe − expr = the codegen-break cost;
  *  - `none`: no barrier, the a-side filter sinks below its exchange
  *    and both sides rebuild the upstream (r18 measured the two-sided
  *    rebuild at +41% on organic corpora). expr − none isolates what
  *    exchange sharing is worth WHEN THE SALT IS ENGAGED — if negative,
  *    the rebuild beats the barrier and the architecture answer changes;
  *  - `plain` (salt off): the skew-exposed reference the escape rescues.
  *
  * All four interleaved per rep inside ONE warmed session (single-shot
  * JVM timings on this container are ±10–30% ambient noise; alternation
  * is the r17 methodology). Output parity asserted across every mode.
  *
  * Run: sbt "Test/runMain graft.probe.D04BarrierProbe DIR [reps] [nSalts] [hotMin] [warmup]"
  */
object D04BarrierProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val nSalts = args.lift(2).map(_.toInt).getOrElse(32)
    val hotMin = args.lift(3).map(_.toInt).getOrElse(1024)
    val warmupMode = args.lift(4).getOrElse("plain")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(mode: String): (Long, Double) = {
      if (mode == "plain") {
        spark.conf.unset("spark.graft.d04.salt")
        spark.conf.unset("spark.graft.d04.salt.hotMin")
        spark.conf.unset("spark.graft.d04.salt.barrier")
      } else {
        spark.conf.set("spark.graft.d04.salt", nSalts.toString)
        spark.conf.set("spark.graft.d04.salt.hotMin", hotMin.toString)
        spark.conf.set("spark.graft.d04.salt.barrier", mode)
      }
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d04")(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (n, sec)
    }

    val (nw, tw) = run(warmupMode)
    println(f"D04BARRIER dir=$dir warmup $warmupMode rows=$nw wall=$tw%.1f s")
    var nRef = nw
    val modes = Seq("expr", "observe", "none", "plain")
    for (r <- 1 to reps) {
      // ROTATE the order each rep: with a fixed order, position-in-cycle
      // effects (GC/page-cache state left by the previous mode) land on
      // the same mode every rep and masquerade as a mode effect — the
      // first x100 run of this probe charged expr ~+50% that way
      val order = modes.drop((r - 1) % modes.length) ++
        modes.take((r - 1) % modes.length)
      for (mode <- order) {
        val (n, sec) = run(mode)
        require(n == nRef, s"row count moved: $n vs $nRef ($mode)")
        nRef = n
        println(f"D04BARRIER dir=$dir rep=$r mode=$mode%-8s nSalts=$nSalts " +
          f"hotMin=$hotMin rows=$n wall=$sec%.1f s")
      }
    }
    spark.stop()
  }
}
