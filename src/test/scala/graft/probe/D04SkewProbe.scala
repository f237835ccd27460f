package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.queries.DedupQueries

/** Measured probe for the d04 hot-shingle m²/2 hazard (VERDICT r9 #6).
  *
  * Corpus: `nDocs` documents, `nHot` of which share ONE token 3-gram
  * ("hot common token"); every other shingle is document-unique. The
  * inverted-index self-join then emits C(nHot, 2) rows from that single
  * join key. The input partition holding the hot shingle is only nHot
  * rows — far below AQE's byte-based skew thresholds — so AQE's skew
  * split never fires and the whole m²/2 expansion lands on ONE task:
  * OUTPUT skew invisible to INPUT-sized detection.
  *
  * Since round 18 the probe measures the PRODUCT path, not a probe-local
  * copy: `DedupQueries.coShinglePairs` with `spark.graft.d04.salt`
  * unset (plain) vs set (hot keys salted across N buckets, cold keys
  * plain), asserting both produce identical pair counts.
  *
  * Run: sbt "Test/runMain graft.probe.D04SkewProbe [nDocs] [nHot] [nSalts]"
  */
object D04SkewProbe {

  def corpus(s: SparkSession, nDocs: Int, nHot: Int): DataFrame = {
    import s.implicits._
    (0 until nDocs).map { i =>
      val filler = (0 until 8).map(j => s"u${i}x$j").mkString(" ")
      val text =
        if (i < nHot) s"hot common token $filler" else s"c$i cc$i ccc$i $filler"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  def shingleFrame(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      explode(array_distinct(TextFns.shingles(col("text"), 3))).as("s"))
    .repartition(32, col("s"))

  private val d04Confs = Seq("spark.graft.d04.salt",
    "spark.graft.d04.salt.hotMin", "spark.graft.d04.salt.sampleInv",
    "spark.graft.d04.salt.sampleDir")

  /** Apply `vals` (None = unset) for the duration of `f`, then restore
    * every d04 conf to its PRIOR value — the probe must not clobber a
    * caller's session settings (the conf only matters at plan-build
    * time, so restoring after the build is sufficient). */
  private def withD04Confs[T](s: SparkSession,
                              vals: Map[String, Option[String]])(f: => T): T = {
    val prior = d04Confs.map(k => k -> s.conf.getOption(k)).toMap
    def apply(m: Map[String, Option[String]]): Unit = m.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
    apply(prior.map { case (k, _) => k -> vals.getOrElse(k, None) })
    try f finally apply(prior)
  }

  /** The shipped d04 pair shape, plain (conf unset). */
  def plainPairs(s: SparkSession, sh: DataFrame): DataFrame =
    withD04Confs(s, Map.empty)(DedupQueries.coShinglePairs(s, sh))

  /** The shipped d04 pair shape with the salted escape ON: shingles
    * whose SAMPLED posting-list estimate exceeds `hotMin` join
    * a-side-salted / b-side-replicated; cold shingles keep salt 0.
    * Exact: every (a, b, s) match survives in exactly one salt bucket. */
  def saltedPairs(s: SparkSession, sh: DataFrame,
                  hotMin: Int, nSalts: Int): DataFrame =
    withD04Confs(s, Map(
      "spark.graft.d04.salt" -> Some(nSalts.toString),
      "spark.graft.d04.salt.hotMin" -> Some(hotMin.toString)))(
      DedupQueries.coShinglePairs(s, sh))

  private def time(label: String)(f: => Long): Long = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($n rows)")
    n
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(20000)
    val nHot = args.lift(1).map(_.toInt).getOrElse(10000)
    val nSalts = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sh = shingleFrame(corpus(spark, nDocs, nHot)).localCheckpoint()
    println(s"[probe] nDocs=$nDocs nHot=$nHot nSalts=$nSalts " +
      s"shingleRows=${sh.count()} expectedHotPairs=${nHot.toLong * (nHot - 1) / 2}")
    // warmup both plans at tiny scale for codegen
    time("warmup plain (cold keys)")(plainPairs(spark, sh.limit(2000)).count())
    time("warmup salted")(
      saltedPairs(spark, sh.limit(2000), 16, nSalts).count())
    // interleaved, twice each: the container shows multi-minute ambient
    // bursts, so adjacent same-shape runs can differ 2x — alternation
    // separates shape effects from environment drift
    val q1 = time(s"hot-salted (> 16 docs) #1")(
      saltedPairs(spark, sh, 16, nSalts).count())
    val p1 = time("plain (AQE on) #1")(plainPairs(spark, sh).count())
    val q2 = time(s"hot-salted (> 16 docs) #2")(
      saltedPairs(spark, sh, 16, nSalts).count())
    val p2 = time("plain (AQE on) #2")(plainPairs(spark, sh).count())
    require(p1 == q1 && p1 == q2 && p1 == p2,
      s"salted shape changed results: $p1 $p2 vs $q1 $q2")
    spark.stop()
  }
}
