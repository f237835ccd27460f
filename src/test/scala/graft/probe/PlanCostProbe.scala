package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.queries.DedupQueries

/** Round-21 measurement (guide §1/§7.3): split each query's wall clock
  * into DRIVER-SIDE PLANNING (DataFrame construction + analysis +
  * optimization + physical planning, forced via `executedPlan` before any
  * action) and EXECUTION (the noop write, which re-plans adaptively and
  * runs the jobs). Per-query cost at sf0.1 is sub-second for most of the
  * suite, so a fat constant planning term would mean the bench is
  * measuring Catalyst, not the engine — and planning is the one cost that
  * does NOT shrink when the optimizer's runtime work is amortized at
  * 100 TB (it is single-threaded driver work, guide §7.3).
  *
  * Reports the MIN over reps of each phase (min rejects contention; the
  * phases are measured in the same rep so they sum to a real run).
  *
  * Run: sbt "Test/runMain graft.probe.PlanCostProbe DIR [regex] [reps]"
  */
object PlanCostProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val only = args.lift(1).map(_.r)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // optional 4th arg: k=v,k=v session confs applied before any query
    // construction (r22: used to A/B AQE coalescing settings)
    val confs = args.lift(3).toSeq.flatMap(_.split(',')).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    // PLANCOST_CPUS mirrors the bench's $SPARK_GRAFT_CPUS knob (r22: used
    // to localize the 8c-beats-32c de-scaling of the s-family)
    val cpus = sys.env.getOrElse("PLANCOST_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    if (confs.nonEmpty) println(s"[plancost] confs: ${confs.mkString(" ")}")
    if (cpus != 32) println(s"[plancost] cpus: $cpus")

    val resetBefore: Map[String, () => Unit] = Map(
      "d02" -> (() => DedupQueries.releaseShared(spark, "minhash")),
      "d15" -> (() => DedupQueries.releaseShared(spark, "d15")),
      "w12" -> (() => DedupQueries.releaseShared(spark, "w12qb")))

    def onceSplit(name: String): (Double, Double) = {
      resetBefore.get(name).foreach(_.apply())
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan // force analysis/optimization/planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    // warmup: JVM + codegen + parquet footer caches (Bench's pair)
    onceSplit("q01"); onceSplit("s01")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    println(f"[plancost] ${"query"}%-5s ${"plan_s"}%8s ${"exec_s"}%8s plan_pct")
    var planSum = 0.0
    var execSum = 0.0
    names.foreach { n =>
      val runs = (0 until reps).map(_ => onceSplit(n))
      val plan = runs.map(_._1).min
      val exec = runs.map(_._2).min
      planSum += plan; execSum += exec
      println(f"[plancost] $n%-5s $plan%8.3f $exec%8.3f ${100 * plan / (plan + exec)}%5.1f%%")
    }
    println(f"[plancost] TOTAL plan=$planSum%.2f s exec=$execSum%.2f s " +
      f"(plan ${100 * planSum / (planSum + execSum)}%.1f%% of suite)")
    DedupQueries.releaseShared(spark)
    spark.stop()
  }
}
