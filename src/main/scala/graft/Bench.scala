package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Execution is forced through the `noop` data source writer — a `count()`
  * would let Catalyst prune the projected columns and under-report
  * projection-heavy queries. One untimed warmup run amortizes JVM/codegen
  * startup so per-query numbers reflect steady-state plan execution.
  */
object Bench {
  /** Bytes of stdout the driver's tail capture retains. Anything before the
    * last `TailCaptureBytes` of output is lost, so the metric line must be
    * printed LAST and stay under this budget — r2 (full-precision doubles)
    * and r7 (the runs map appended to the metric line) both breached it and
    * the driver recorded no bench total for those rounds.
    */
  val TailCaptureBytes = 2000

  /** Keep the metric line this far under the window. r6's 3-decimal line
    * parsed at ~1950 bytes, so a 1950-byte budget is proven safe; the current
    * 72-query suite emits 1927 bytes at 3 decimals and degrades to 2 decimals
    * (1855 bytes) before the budget is ever at risk.
    */
  val SafetyMargin = 50

  def fmt(v: Double, scale: Int = 3): String =
    if (v < 0) "-1"
    else BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toString

  def queriesJson(timings: Seq[(String, Double)], scale: Int): String =
    timings.map { case (k, v) => "\"" + k + "\":" + fmt(v, scale) }
      .mkString("{", ",", "}")

  /** Full-fidelity per-query detail (3-decimal timings + run counts), printed
    * on its own line BEFORE the metric line. It may be arbitrarily long; only
    * its tail shares the capture window with the metric line.
    */
  def detailLine(timings: Seq[(String, Double)], runs: Seq[(String, Int)],
                 sfName: String): String = {
    val rs = runs.map { case (k, r) => "\"" + k + "\":" + r }
      .mkString("{", ",", "}")
    s"""{"bench_detail":{"queries":${queriesJson(timings, 3)},"runs":$rs},"sf":"$sfName"}"""
  }

  /** The driver-facing metric line. Degrades per-query precision 3→1 decimals
    * if needed, and as a last resort drops the per-query map entirely (it is
    * already on the detail line) — it never exceeds the capture budget.
    */
  def metricLine(timings: Seq[(String, Double)], sfName: String): String = {
    val total = timings.map(_._2).filter(_ >= 0).sum
    def line(qs: Option[String]): String = {
      val qpart = qs.map(q => s""","queries":$q""").getOrElse("")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$qpart,"sf":"$sfName"}"""
    }
    (3 to 1 by -1).iterator
      .map(scale => line(Some(queriesJson(timings, scale))))
      .find(_.length <= TailCaptureBytes - SafetyMargin)
      .getOrElse(line(None))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // d02 builds the shared minhash-pair checkpoint that d07 then reuses.
    // Without a reset, run b (and min-of-two) would read the cached pairs
    // and report ~0 s — hiding the real minhash pass behind the warmup
    // policy. Dropping the checkpoint before each d02 run makes d02's
    // number the true one-shared-materialization cost, while d07's number
    // shows the designed reuse win.
    val resetBefore: Map[String, () => Unit] = Map(
      "d02_minhash_lsh" -> (() => graft.queries.DedupQueries.releaseShared(spark)))

    def force(name: String): Double = {
      resetBefore.get(name).foreach(_.apply())
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: JVM + codegen + parquet footer caches
    force("q01_pricing_summary")
    force("s01_cosine_topk")

    // steady-state timing: min of two runs per query — the first run of
    // each distinct plan pays one-time Janino/JIT compilation that is
    // amortized away on any real workload.
    // SPARK_GRAFT_ONLY: regex over query names for targeted runs (scale
    // probes, single-query investigation); absent = the full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.findFirstIn(n).isDefined))
    // Sub-2 s queries get a THIRD run and report the median: single-run
    // environment spikes on trivial scan-aggs repeatedly read as phantom
    // 2-8x regressions across rounds (a one-off stall survives min-of-two
    // whenever it hits the first run and the second is also disturbed);
    // the median of three kills any single outlier. Long queries keep
    // min-of-two — their runtimes dwarf scheduler jitter, and a third run
    // of the multi-second dedup suite would cost more than it informs.
    val results = names.map { n =>
      val a = force(n)
      val b = force(n)
      if (a < 0 || b < 0) n -> (-1.0, 2)
      else if (math.min(a, b) >= 2.0) n -> (math.min(a, b), 2)
      else {
        val c = force(n)
        if (c < 0) n -> (-1.0, 3)
        else n -> (Seq(a, b, c).sorted.apply(1), 3)
      }
    }
    graft.queries.DedupQueries.releaseShared(spark)
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val timings = results.map { case (k, (v, _)) => k -> v }
    val runs = results.map { case (k, (_, r)) => k -> r }
    // Detail first, metric line LAST — see TailCaptureBytes.
    println(detailLine(timings, runs, sfName))
    println(metricLine(timings, sfName))
    spark.stop()
  }
}
