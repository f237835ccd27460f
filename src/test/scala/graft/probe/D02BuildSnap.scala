// Lives in graft.queries (not graft.probe) because it dumps the
// private[queries] build halves; kept under probe/ with the other tools.
package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Round-22 evidence tool: dumps the d02 calibration BUILD plans — the
  * frames the shared-checkpoint materialization actually executes (the d02
  * query itself explains as a bare checkpoint scan, so PlanSnap can't show
  * this). Three files:
  *
  *   - `d02_cand_<suffix>.txt`  — the band-join candidate frame build
  *     (scan + map-side signatures + band self-join + pair aggregation);
  *     materialized ONCE per build since r22.
  *   - `d02_verify_<suffix>.txt` — the verify half AS SHIPPED: consuming
  *     the materialized candidate blocks (ExistingRDD leaves, no signature
  *     recompute).
  *   - `d02_inline_<suffix>.txt` — the fully inlined pipeline
  *     (minhashPairsForPlan): the r21-and-earlier shipped shape, kept as
  *     the documentation/contrast artifact.
  *
  * A suffix ending in `!` executes each frame (noop-free toRdd.count) so
  * the dump holds the FINAL adaptive plan with ReusedExchange visible.
  *
  * Run: sbt "Test/runMain graft.queries.D02BuildSnap OUTDIR SUFFIX [sfDir]"
  */
object D02BuildSnap {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val execute = args(1).endsWith("!")
    val suffix = args(1).stripSuffix("!")
    val sf = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      if (execute) df.queryExecution.toRdd.count()
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
        df.queryExecution.explainString(FormattedMode))
      println(s"[d02snap] wrote ${name}_$suffix.txt")
    }

    DedupQueries.releaseShared(spark, "minhash")
    val candBuild = DedupQueries.candidatePairs(spark, sf)
    dump("d02_cand", candBuild)
    val cand = DedupQueries.sharedCheckpoint(spark, sf, "minhash/cand")(
      DedupQueries.candidatePairs(spark, sf))
    dump("d02_verify", DedupQueries.calibrationPairs(spark, sf, cand))
    dump("d02_inline", DedupQueries.minhashPairsForPlan(spark, sf))
    DedupQueries.releaseShared(spark)
    spark.stop()
  }
}
