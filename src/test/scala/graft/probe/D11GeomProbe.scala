package graft.probe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns

/** Recall measurement behind d11's table-count escalation rule
  * (`DedupQueries.d11AutoGeometry` regime 3, VERDICT r17 #3).
  *
  * The escalation trades OR-amplification tables for bits-per-table once
  * the dim budget saturates (needed·tables > 64). Fewer tables can only
  * LOSE candidate pairs (a pair is a candidate iff it collides in ANY
  * table, and regime 3's tables are a prefix of regime 2's), so the
  * question the rule had to answer before shipping was: how much recall
  * does each dropped table cost, at the occupancy the law targets?
  *
  * Method (s07's measurement loop, applied to the dedup contract):
  * ground truth is the EXACT all-pairs cosine ≥ 0.4 set (d05 semantics —
  * feasible at probe scales); each geometry's candidate set is d11's
  * own construction (disjoint [t·bits, t·bits+bits) sign-slices,
  * bucket equi-join, distinct); recall = |candidates ∩ truth| / |truth|.
  * Bits are held at the law's occupancy target for the probe corpus so
  * the TABLE count is the only variable — exactly the regime-3 trade.
  *
  * Run: sbt "Test/runMain graft.probe.D11GeomProbe [sfDir] [bits]"
  */
object D11GeomProbe {

  def candidates(e: DataFrame, nTables: Int, bits: Int): DataFrame = {
    val tabbed = e.select(col("vec_id"),
      explode(array((0 until nTables).map { t =>
        struct(lit(t).as("tbl"),
          VectorFns.signBucketSlice(col("embedding"), t * bits, bits).as("bkt"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    tabbed.as("a").join(tabbed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  def truth(e: DataFrame): DataFrame =
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cs", VectorFns.cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("cs") >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cs"))

  /** Exact cosine over ONLY the planted pairs (vec, vec+1M) / (vec, vec+2M)
    * — an equi-join on the constructed ids, linear in n. At ×100 (300k
    * rows incl. plants) the all-pairs [[truth]] is 4.5×10¹⁰ cosine
    * evaluations (~an hour); but the corpus has NO organic pair above
    * cosine 0.7 (probed at sf0.1, and the scale-probe's per-copy dim
    * permutation preserves the per-copy pair structure exactly while
    * cross-copy cosine ~ 0), so for the ≥0.7 and ≥0.9 bands — the bands
    * the escalation trade is graded on — the planted pairs ARE the
    * complete truth. The ≥0.4 band is NOT complete under this mode and
    * is reported as planted-only. */
  def plantedTruth(e: DataFrame): DataFrame = {
    val base = e.filter(col("vec_id") < 1000000L)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    e.filter(col("vec_id") >= 1000000L)
      .select((col("vec_id") % 1000000L).as("vec_a"),
        col("vec_id").as("vec_b"), col("embedding").as("eb"))
      .join(base, Seq("vec_a"))
      .withColumn("cs", VectorFns.cosine(col("ea"), col("eb")))
      .select(col("vec_a"), col("vec_b"), col("cs"))
  }

  /** `base` plus deterministic planted near-dups. The synthetic corpora
    * have NO organic pairs above cosine 0.7 (probed: max truth band at
    * sf0.1 is ~0.55), so the near-dup bands a recall probe grades on
    * would be empty — every 4th vector gets a copy perturbed by a fixed
    * pseudo-noise field (sin of id/dim — no RNG), scaled for ~0.95
    * ("strong", offset +1M) and ~0.85 ("moderate", offset +2M) cosine
    * against its original; vectors are unit-norm so cos = 1/sqrt(1+|n|^2).
    * [[plantedTruth]] recovers the exact pair cosines linearly. */
  def withPlants(base: DataFrame): DataFrame = {
    def plant(scale: Double, offset: Long): DataFrame =
      base.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + offset).as("vec_id"), col("embedding"))
        .select(col("vec_id"), expr(
          s"transform(embedding, (v, i) -> cast(v + $scale * " +
            "sin(vec_id * 131 + i * 17) as float))").as("embedding"))
    base.union(plant(0.058, 1000000L)).union(plant(0.11, 2000000L))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val e = withPlants(base).localCheckpoint()
    val n = e.count()
    // the law's occupancy-target bits for THIS corpus (unless overridden):
    // holds occupancy fixed so table count is the only variable
    // second arg: either occupancy bits for the default 4..1-table sweep,
    // or an explicit geometry list "4x16,3x17" — the latter compares the
    // saturated dim-budget cap against regime-3 escalation side by side
    // at whatever corpus scale `dir` holds (VERDICT r18 #3: the ×100
    // cross-check of the 1-(1-p)^t extrapolation)
    val lawBits =
      math.max(4, math.ceil(math.log(n.toDouble / 4.0) / math.log(2.0)).toInt)
    val geoms: Seq[(Int, Int)] = args.lift(1) match {
      case Some(g) if g.contains('x') => g.split(',').toSeq.map { s =>
        val Array(t, b) = s.split('x'); (t.toInt, b.toInt)
      }
      case other =>
        val bits = other.map(_.toInt).getOrElse(lawBits)
        Seq(4, 3, 2, 1).map(t => (t, bits))
    }
    // third arg "planted": planted-pair truth (complete for the >=0.7
    // and >=0.9 bands; see plantedTruth) — the ×100 cross-check mode
    val gt = (if (args.lift(2).contains("planted")) plantedTruth(e)
              else truth(e)).localCheckpoint()
    // recall per similarity band: the 0.4 contract floor admits weakly-
    // similar pairs whose sign-LSH collision probability is intrinsically
    // low at ANY geometry (p_bit = 1 - acos(cs)/pi -> 0.63 at cs = 0.4 vs
    // 0.89 at cs = 0.9); the near-dup band >= 0.9 is what a dedup pass
    // actually harvests, so it is the band the escalation trade is
    // graded on
    val bands = Seq(0.4, 0.7, 0.9)
    val nTruth = bands.map(b => b -> gt.filter(col("cs") >= b).count()).toMap
    println(s"[probe] dir=$dir n=$n lawBits=$lawBits truthPairs=" +
      bands.map(b => s">=$b: ${nTruth(b)}").mkString(", "))
    for ((t, bits) <- geoms) {
      require(t * bits <= 64, s"$t tables x $bits bits busts the dim budget")
      val cand = candidates(e, t, bits).localCheckpoint()
      val nCand = cand.count()
      val rec = bands.map { b =>
        val hit = cand.join(gt.filter(col("cs") >= b), Seq("vec_a", "vec_b"),
          "left_semi").count()
        f"r>=$b:${if (nTruth(b) == 0) 0.0 else hit.toDouble / nTruth(b)}%6.4f"
      }.mkString(" ")
      println(f"[probe] tables=$t bits=$bits candidates=$nCand%8d $rec " +
        f"workPerDoc=${nCand.toDouble / n}%8.2f")
    }
    spark.stop()
  }
}
