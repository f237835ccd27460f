package graft.sources

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
  * SAFETY: [[read]] re-applies the sample predicate, so an extract
  * written with a DIFFERENT (coarser or stale) sampleInv can only
  * UNDER-sample — detection may miss borderline-hot shingles (load
  * balance on keys whose m²/2 is small by definition), but the sampled
  * set is always a subset of the true sample and d04's output is exact
  * regardless of which keys salt. A missing/unreadable extract falls
  * back to the in-plan sample with a warning, never an error.
  */
object SampleExtract {

  /** Default sample rate — matches `spark.graft.d04.salt.sampleInv`. */
  val DefaultInv = 128

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def samplePredicate(sampleInv: Int) =
    pmod(xxhash64(col("doc_id")), lit(sampleInv)) === 0

  /** Write the extract: one linear filter pass over `docs`, all columns
    * kept (the detection shingle frame needs `doc_id` + `text`; keeping
    * the rest costs 1/sampleInv of their bytes and lets other sampled
    * diagnostics reuse the file). */
  def write(docs: DataFrame, outDir: String,
            sampleInv: Int = DefaultInv): Unit =
    docs.filter(samplePredicate(sampleInv))
      .write.mode("overwrite").parquet(outDir)

  /** Read the extract re-guarded by the live sample predicate (see
    * SAFETY above). The filter is a no-op on a matching extract and
    * costs nothing at extract scale. */
  def read(s: SparkSession, dir: String, sampleInv: Int): DataFrame =
    s.read.parquet(dir).filter(samplePredicate(sampleInv))

  /** The conf-resolved detection documents frame for d04's salted path:
    * `Some(extract)` when `spark.graft.d04.salt` is on AND
    * `spark.graft.d04.salt.sampleDir` names a readable extract; `None`
    * (in-plan sampling) otherwise. Existence is checked only when the
    * salt conf is on so the default d04 build stays IO-free. */
  def detectionDocs(s: SparkSession): Option[DataFrame] =
    if (s.conf.getOption("spark.graft.d04.salt").isEmpty) None
    else s.conf.getOption("spark.graft.d04.salt.sampleDir").flatMap { d =>
      val sampleInv = s.conf.getOption("spark.graft.d04.salt.sampleInv")
        .map(_.trim.toInt).getOrElse(DefaultInv)
      val p = new org.apache.hadoop.fs.Path(d)
      val exists =
        try p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
        catch { case scala.util.control.NonFatal(_) => false }
      if (exists) Some(read(s, d, sampleInv))
      else {
        log.warn(s"spark.graft.d04.salt.sampleDir=$d does not exist — " +
          "hot detection falls back to the in-plan document sample " +
          "(full text scan); write the extract with SampleExtract.write")
        None
      }
    }
}
