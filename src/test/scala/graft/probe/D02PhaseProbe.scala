// In graft.queries to reach the private[queries] build halves (see
// D02BuildSnap); kept under probe/ with the other measurement tools.
package graft.queries

import org.apache.spark.sql.SparkSession

/** Round-22 measurement (guide §7.3, VERDICT r21 #9): d02's wall is ~90%
  * DRIVER-side Catalyst work (PlanCostProbe: 2.06 s plan vs 0.22 s exec at
  * sf0.1) — this probe splits that planning time by phase
  * (analysis/optimization/planning) and prints the top optimizer rules by
  * cumulative time, for each half of the calibration build, so the fix
  * targets the actual hot rule instead of a guess.
  *
  * Run: sbt "Test/runMain graft.queries.D02PhaseProbe DIR [reps]"
  */
object D02PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def profile(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = mk
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val qe = df.queryExecution
        val phases = qe.tracker.phases.map { case (k, v) =>
          f"$k=${v.durationMs}ms"
        }.mkString(" ")
        println(f"[phase] $label rep$rep construct=${(t1 - t0) / 1e6}%.0fms " +
          f"toPhysical=${(t2 - t1) / 1e6}%.0fms  $phases")
        if (rep == reps) {
          println(s"[phase] $label top rules by time:")
          qe.tracker.topRulesByTime(12).foreach { case (rule, s) =>
            println(f"[phase]   ${s.totalTimeNs / 1e6}%8.1fms x${s.numInvocations}%-4d " +
              f"eff=${s.numEffectiveInvocations}%-3d $rule")
          }
        }
      }
    }

    profile("cand-build") { DedupQueries.candidatePairs(spark, dir) }
    DedupQueries.releaseShared(spark)
    val cand = DedupQueries.sharedCheckpoint(spark, dir, "minhash/cand")(
      DedupQueries.candidatePairs(spark, dir))
    cand.write.format("noop").mode("overwrite").save()
    profile("verify-build") { DedupQueries.calibrationPairs(spark, dir, cand) }
    DedupQueries.releaseShared(spark)
    spark.stop()
  }
}
