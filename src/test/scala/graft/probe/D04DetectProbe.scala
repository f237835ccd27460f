package graft.probe

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.sources.SampleExtract

/** Measures what the d04 salted escape's HOT-DETECTION SCAN costs, and
  * what the SampleExtract cut buys back (VERDICT r18 #1).
  *
  * Round 18 measured the salted path at +41% over plain on an organic
  * ×100 corpus and attributed the bulk to detection: the in-plan
  * 1/128 document sample prunes the shingle EXPLODE but not the SCAN —
  * `xxhash64(doc_id) % 128` cannot push into parquet, so detection
  * decodes every text byte in the corpus to keep 1/128 of rows. With
  * `spark.graft.d04.salt.sampleDir` pointing at a persisted 1/128
  * extract (one linear pass at ingest), the detection scan reads
  * corpus/128 bytes instead.
  *
  * Three modes of the SHIPPED d04 query, INTERLEAVED in one warmed
  * session (single-shot JVM timings on this box are ±10% ambient noise):
  * plain (salt off), salted with in-plan detection, salted with
  * extract detection. All three must produce identical row counts.
  *
  * Run: sbt "Test/runMain graft.probe.D04DetectProbe DIR [reps] [nSalts] [hotMin]"
  */
object D04DetectProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfprobe100")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
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

    // the ingest artifact under test: 1/128 extract, one linear pass
    val extractDir = s"$dir/documents_sample128"
    val tExtract = {
      val t0 = System.nanoTime()
      SampleExtract.write(
        spark.read.parquet(s"$dir/documents.parquet"), extractDir)
      (System.nanoTime() - t0) / 1e9
    }
    println(f"D04DETECT dir=$dir extract-write wall=$tExtract%.1f s (one-off ingest cost)")

    val saltConfs = Seq("spark.graft.d04.salt", "spark.graft.d04.salt.hotMin",
      "spark.graft.d04.salt.sampleDir")
    def run(mode: String): (Long, Double) = {
      saltConfs.foreach(spark.conf.unset)
      if (mode != "plain") {
        spark.conf.set("spark.graft.d04.salt", nSalts.toString)
        spark.conf.set("spark.graft.d04.salt.hotMin", hotMin.toString)
      }
      if (mode == "salted-extract")
        spark.conf.set("spark.graft.d04.salt.sampleDir", extractDir)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("d04")(spark, dir).count()
      ((n, (System.nanoTime() - t0) / 1e9))
    }

    val (nw, tw) = run("plain")
    println(f"D04DETECT dir=$dir warmup plain rows=$nw wall=$tw%.1f s")
    for (r <- 1 to reps; mode <- Seq("salted-inplan", "salted-extract", "plain")) {
      val (n, sec) = run(mode)
      require(n == nw, s"row count moved: $n vs $nw ($mode)")
      println(f"D04DETECT dir=$dir rep=$r mode=$mode%-14s nSalts=$nSalts " +
        f"hotMin=$hotMin rows=$n wall=$sec%.1f s")
    }
    spark.stop()
  }
}
