package graft.probe

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns

/** A/B probe for d16's assignment argmin: the shipped packed-long
  * `min(long)` HashAggregate vs the struct `min_by` formulation it
  * replaced (which plans as a SortAggregate — struct buffers are not
  * mutable in UnsafeRow — and therefore SORTS the n×k exploded
  * assignment stream twice, partial and final). Run on the 100× probe
  * corpus (200k vecs, k=√n=447 → 89M cosine rows through the argmin).
  *
  *   Test/runMain graft.probe.ProbeD16 [sfDir]
  */
object ProbeD16 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfprobe100"
    val e = Tables.loadSpread(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val k = math.max(8L, math.sqrt(n.toDouble).toLong)
    val cents = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    println(s"n=$n k=$k (n*k = ${n * k} cosine rows per variant)")

    def time(label: String)(f: => Long): Unit = {
      // median of 3, first run warm-up included separately
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime; val r = f
        ((System.nanoTime - t0) / 1e9, r)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"$label%-24s $med%.3f s (runs ${ts.map(t => f"${t._1}%.2f").mkString("/")})  rows=${ts.head._2}")
    }

    val microDist = round((lit(1d) -
      round(VectorFns.cosine(col("embedding"), col("cv")), 6)) * 1e6)
      .cast("long")
    time("packed-long min") {
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), (shiftleft(microDist, 42) + col("cid")).as("packed"))
        .groupBy(col("vec_id")).agg(min(col("packed")).as("p"))
        .select(sum(col("p").bitwiseAND(lit((1L << 42) - 1)))).head().getLong(0)
    }
    val dist = lit(1d) - round(VectorFns.cosine(col("embedding"), col("cv")), 6)
    time("struct min_by") {
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"), dist.as("dist"))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"))
        .select(sum(col("cid"))).head().getLong(0)
    }
    s.stop()
  }
}
