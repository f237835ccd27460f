package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted 1/`sampleInv` document sample for d04's salted hot-shingle
  * detection (`spark.graft.d04.salt.sampleDir`).
  *
  * WHY IT EXISTS: the salted escape's hot detection samples documents by
  * `xxhash64(doc_id) % sampleInv == 0` — a hash predicate parquet cannot
  * push, so the in-plan sample prunes the shingle EXPLODE but still
  * DECODES every text byte in the corpus just to keep 1/128 of rows. At
  * 100 TB that single detection scan is a full-corpus read (the dominant
  * share of the measured +41% salt overhead on organic corpora,
  * BENCH_NOTES "Round 18"). This extract trades one linear pass at
  * ingest — amortized over every salted run — for a detection scan that
  * reads corpus/sampleInv bytes. A 1/128 EXTRACT beats re-laying the
  * corpus out bucketed-by-doc-hash: same pruning for detection (the only
  * consumer of the sample), 1/128 the storage instead of a full second
  * copy, and no constraint on how the corpus itself is partitioned.
  *
  * SAFETY: [[read]] re-applies the sample predicate, so the sampled set
  * is always a SUBSET of the extract — but the live rate must be a
  * multiple of the write-time rate for the subset to equal the TRUE
  * 1/sampleInv sample. A non-divisor mismatch (extract at 128, conf 100)
  * collapses effective density to 1/lcm while the hot threshold still
  * assumes 1/sampleInv, so detection silently misses genuinely hot keys
  * (ADVICE r19). [[write]] therefore persists its rate in a
  * `_graft_sample_inv` marker; [[read]] refuses a non-divisor mismatch,
  * and [[detectionDocs]] falls back to the in-plan sample (correct
  * density, full-scan cost) with a loud warning on that or ANY other
  * read failure — missing dir, no parquet, missing columns.
  */
object SampleExtract {

  /** Default sample rate — matches `spark.graft.d04.salt.sampleInv`. */
  val DefaultInv = 128

  /** Marker file persisting the write-time sample rate next to the
    * parquet (underscore prefix = ignored by parquet directory scans). */
  val MarkerName = "_graft_sample_inv"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def samplePredicate(sampleInv: Int) =
    pmod(xxhash64(col("doc_id")), lit(sampleInv)) === 0

  /** Write the extract: one linear filter pass over `docs`, all columns
    * kept (the detection shingle frame needs `doc_id` + `text`; keeping
    * the rest costs 1/sampleInv of their bytes and lets other sampled
    * diagnostics reuse the file). The write-time rate is persisted in
    * the [[MarkerName]] marker so readers can verify divisibility. */
  def write(docs: DataFrame, outDir: String,
            sampleInv: Int = DefaultInv): Unit = {
    require(sampleInv >= 1, s"sampleInv must be >= 1 (got $sampleInv)")
    docs.filter(samplePredicate(sampleInv))
      .write.mode("overwrite").parquet(outDir)
    val p = new Path(outDir, MarkerName)
    val fs = p.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(sampleInv.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The write-time sample rate from the extract's marker, if present
    * (extracts written before the marker existed have none — their
    * readers keep the subset-only guarantee). */
  def writeTimeInv(s: SparkSession, dir: String): Option[Int] = {
    val p = new Path(dir, MarkerName)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8).trim
      finally in.close()
      Some(txt.toInt)
    }
  }

  /** Read the extract re-guarded by the live sample predicate (see
    * SAFETY above). The filter is a no-op on a matching extract and
    * costs nothing at extract scale. Refuses a marker whose write-time
    * rate does not divide `sampleInv` — the re-filtered set would be
    * the 1/lcm subset, not the true 1/sampleInv sample. */
  def read(s: SparkSession, dir: String, sampleInv: Int): DataFrame = {
    require(sampleInv >= 1, s"sampleInv must be >= 1 (got $sampleInv)")
    writeTimeInv(s, dir).foreach { w =>
      require(w >= 1 && sampleInv % w == 0,
        s"sample extract at $dir was written at 1/$w but is being read " +
          s"at 1/$sampleInv, which 1/$w does not divide — the re-filtered " +
          s"sample would have 1/lcm($w, $sampleInv) density, not the " +
          s"1/$sampleInv the hot threshold assumes; rewrite the extract " +
          "or set spark.graft.d04.salt.sampleInv to a multiple of " + w)
    }
    s.read.parquet(dir).filter(samplePredicate(sampleInv))
  }

  /** The conf-resolved detection documents frame for d04's salted path:
    * `Some(extract)` when `spark.graft.d04.salt` is on AND
    * `spark.graft.d04.salt.sampleDir` names a READABLE extract — parquet
    * that loads and carries `doc_id` + `text`, with a write-time rate
    * (marker, when present) dividing the live one; `None` (in-plan
    * sampling, a loud warning) on any failure. Existence is checked only
    * when the salt conf is on so the default d04 build stays IO-free.
    * A malformed `sampleInv` conf fails with the conf key in the message
    * (same contract as coShinglePairs's intConf) rather than a bare
    * NumberFormatException or a degenerate pmod-by-zero predicate. */
  def detectionDocs(s: SparkSession): Option[DataFrame] =
    if (s.conf.getOption("spark.graft.d04.salt").isEmpty) None
    else s.conf.getOption("spark.graft.d04.salt.sampleDir").flatMap { d =>
      val key = "spark.graft.d04.salt.sampleInv"
      val sampleInv = s.conf.getOption(key).map { v =>
        try v.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$key must be an integer: got '$v'")
        }
      }.getOrElse(DefaultInv)
      require(sampleInv >= 1, s"$key must be >= 1 (got $sampleInv)")
      try {
        val df = read(s, d, sampleInv)
        val missing = Seq("doc_id", "text").filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"extract lacks column(s) ${missing.mkString(", ")}")
        Some(df)
      } catch {
        case e: IllegalArgumentException if e.getMessage != null &&
            e.getMessage.contains("does not divide") =>
          // rate mismatch is a configuration bug worth failing loudly in
          // a direct read(), but the conf path's contract is "fall back,
          // never error": in-plan sampling has the CORRECT density
          log.warn(s"spark.graft.d04.salt.sampleDir=$d rejected — " +
            s"${e.getMessage}; hot detection falls back to the in-plan " +
            "document sample (full text scan)")
          None
        case scala.util.control.NonFatal(e) =>
          log.warn(s"spark.graft.d04.salt.sampleDir=$d is not a readable " +
            s"extract (${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            "hot detection falls back to the in-plan document sample " +
            "(full text scan); write the extract with SampleExtract.write")
          None
      }
    }
}
