package graft.probe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Measured recall evidence for s08's bucket-count law (VERDICT r19 #4
  * — the d11 treatment applied to the k-NN graph).
  *
  * s08 buckets the corpus with ONE sign-LSH table at
  * bits = max(8, ⌊⌊log₂n⌋/2⌋) and takes each vector's top-3 neighbors
  * among bucket MATES — pair work Σ n_b² ≈ n²/2^bits ≈ n^1.5, the
  * balance the law targets. The un-measured question: what fraction of
  * TRUE near neighbors does a single table at √n buckets keep? Sign-LSH
  * theory says a pair at cosine c shares a bucket with
  * p = (1 − acos(c)/π)^bits — the probe validates that against planted
  * truth (D11GeomProbe's deterministic plants: ~0.95 "strong" and ~0.85
  * "moderate" copies; the corpora have no organic pair above 0.7, so
  * planted truth is COMPLETE for those bands), side by side with forced
  * bits±2 controls so the law's point on the recall/work curve is
  * visible, not just asserted.
  *
  * A planted pair counts as recalled when either direction appears in
  * the graph (a among b's top-3 or b among a's) — the graph consumer's
  * contract (dedup, label propagation) is edge-level. The top-3 cut
  * itself costs ~nothing here: nothing organic outranks a plant, so
  * misses are bucket splits, which is exactly what the law trades.
  *
  * Drives the PRODUCT s08 (SparkEntry.queries, spark.graft.s08.bits) on
  * a temp dir holding the planted corpus — the law's auto-sizing runs
  * unmodified on the `bits=auto` row.
  *
  * Run: sbt "Test/runMain graft.probe.S08RecallProbe [sfDir] [bitsList]"
  *   bitsList: comma list, `auto` = law (default "auto,7,9,11")
  */
object S08RecallProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val bitsList = args.lift(1).getOrElse("auto,7,9,11").split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val e = D11GeomProbe.withPlants(base)
    // the product path reads from disk — stage the planted corpus once
    val tmp = java.nio.file.Files.createTempDirectory("s08probe").toFile
    val probeDir = tmp.getAbsolutePath
    e.write.parquet(s"$probeDir/embeddings.parquet")

    val gt = D11GeomProbe
      .plantedTruth(spark.read.parquet(s"$probeDir/embeddings.parquet"))
      .localCheckpoint()
    val n = spark.read.parquet(s"$probeDir/embeddings.parquet").count()
    val lawBits = math.max(8,
      (63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))) / 2)
    val bands = Seq(("strong>=0.9", col("cs") >= 0.9),
      ("moderate<0.9", col("cs") < 0.9))
    val nTruth = bands.map { case (nm, c) => nm -> gt.filter(c).count() }
    println(s"[probe] dir=$dir n=$n lawBits=$lawBits truth " +
      nTruth.map { case (nm, c) => s"$nm:$c" }.mkString(" "))

    for (b <- bitsList) {
      // "9" = single table at 9 bits; "9x4" = 4 OR-amplified tables
      // (spark.graft.s08.tables) of 9 bits each; "auto" = the law
      val (bitsSpec, effT) = b.trim.split('x') match {
        case Array(bb, tt) => (bb, tt.toInt)
        case Array(bb) => (bb, 1)
      }
      if (bitsSpec == "auto") spark.conf.unset("spark.graft.s08.bits")
      else spark.conf.set("spark.graft.s08.bits", bitsSpec)
      if (effT == 1) spark.conf.unset("spark.graft.s08.tables")
      else spark.conf.set("spark.graft.s08.tables", effT.toString)
      val t0 = System.nanoTime()
      val g = SparkEntry.queries("s08")(spark, probeDir)
        .select(col("vec_id"), col("nbr")).localCheckpoint()
      val nEdges = g.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // edge-level recall: either direction present in the graph
      val hitExpr = gt.as("t").join(
        g.select(col("vec_id").as("vec_a"), col("nbr").as("vec_b"))
          .union(g.select(col("nbr").as("vec_a"), col("vec_id").as("vec_b")))
          .distinct().as("h"),
        Seq("vec_a", "vec_b"), "left_semi")
      val hits = bands.map { case (nm, c) => nm -> hitExpr.filter(c).count() }
      val effBits = if (bitsSpec == "auto") lawBits else bitsSpec.toInt
      // OR-amplified collision model: candidate iff the pair agrees in
      // ANY of the T disjoint slices — 1-(1-p^bits)^T (upper bound; the
      // fixed-dim slices are not independent hyperplanes, see r20 notes)
      val model = (cs: Double) => {
        val p = math.pow(1.0 - math.acos(cs) / math.Pi, effBits.toDouble)
        1.0 - math.pow(1.0 - p, effT.toDouble)
      }
      val rec = hits.zip(nTruth).map { case ((nm, h), (_, t)) =>
        f"$nm:${if (t == 0) 0.0 else h.toDouble / t}%6.4f"
      }.mkString(" ")
      println(f"[probe] bits=$b%-7s (eff $effBits%2d x$effT) edges=$nEdges%9d " +
        f"wall=$sec%6.1f s recall $rec " +
        f"model s=${model(0.95)}%6.4f m=${model(0.85)}%6.4f")
      g.unpersist()
    }
    spark.conf.unset("spark.graft.s08.bits")
    spark.conf.unset("spark.graft.s08.tables")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmTree)); f.delete(): Unit
    }
    rmTree(tmp)
    spark.stop()
  }
}
