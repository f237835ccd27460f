package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Measured probe for the d04 hot-shingle m²/2 hazard (VERDICT r9 #6).
  *
  * Corpus: `nDocs` documents, `nHot` of which share ONE token 3-gram
  * ("hot common token"); every other shingle is document-unique. The
  * inverted-index self-join then emits C(nHot, 2) rows from that single
  * join key. The input partition holding the hot shingle is only nHot
  * rows — far below AQE's byte-based skew thresholds — so AQE's skew
  * split never fires and the whole m²/2 expansion lands on ONE task:
  * OUTPUT skew invisible to INPUT-sized detection. The probe measures
  * the plain shape against a hot-key-salted shape (cold keys join
  * plain; hot keys join with the a-side salted by doc_id and the
  * b-side replicated per salt) and asserts both produce identical pair
  * counts.
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

  /** The d04/minhash-verify join shape: co-shingle pair counts. */
  def plainPairs(sh: DataFrame): DataFrame =
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))

  /** Exact hot-key-salted variant: shingles held by more than `hotMin`
    * docs join with the a-side salted (pmod of doc_id hash) and the
    * b-side replicated once per salt; cold shingles join plain. Exact:
    * every (a, b, s) match survives in exactly one salt bucket.
    */
  def saltedPairs(sh: DataFrame, hotMin: Int, nSalts: Int): DataFrame = {
    val hot = sh.groupBy("s").agg(count(lit(1)).as("m"))
      .filter(col("m") > hotMin).select("s")
    val shHot = sh.join(broadcast(hot), Seq("s"), "left_semi")
    val shCold = sh.join(broadcast(hot), Seq("s"), "left_anti")
    val a = shHot.withColumn("__salt", pmod(hash(col("doc_id")), lit(nSalts)))
    val b = shHot.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    val hotJoined = a.as("a").join(b.as("b"),
        col("a.s") === col("b.s") && col("a.__salt") === col("b.__salt") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val coldJoined = shCold.as("a").join(shCold.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    hotJoined.union(coldJoined).groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
  }

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
    time("warmup plain (cold keys)")(plainPairs(sh.limit(2000)).count())
    time("warmup salted")(saltedPairs(sh.limit(2000), 16, nSalts).count())
    // interleaved, twice each: the container shows multi-minute ambient
    // bursts, so adjacent same-shape runs can differ 2x — alternation
    // separates shape effects from environment drift
    val q1 = time(s"hot-salted (> 16 docs) #1")(saltedPairs(sh, 16, nSalts).count())
    val p1 = time("plain (AQE on) #1")(plainPairs(sh).count())
    val q2 = time(s"hot-salted (> 16 docs) #2")(saltedPairs(sh, 16, nSalts).count())
    val p2 = time("plain (AQE on) #2")(plainPairs(sh).count())
    require(p1 == q1 && p1 == q2 && p1 == p2,
      s"salted shape changed results: $p1 $p2 vs $q1 $q2")
    spark.stop()
  }
}
