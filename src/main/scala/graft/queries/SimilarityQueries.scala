package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * s01 is the exact brute-force baseline: broadcast the (tiny) query set,
  * compute cosine map-side against every vector — at 100 TB this is one scan
  * with no shuffle except the final per-query top-k. s02 is the scale path:
  * a deterministic sign-bit LSH bucket (hash -> equi-join on bucket -> local
  * exact rank), trading recall for a candidate set ~2^bits smaller.
  *
  * Ranking is on round(cosine, 6) with vec_id tie-break so ordering is
  * engine-independent (cosines themselves are bit-identical — double
  * accumulation in index order on both sides).
  */
object SimilarityQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(s, dir, "embeddings").select(col("vec_id"), col("embedding"))

  private val nQueries = 5
  private val lshBits = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact cosine top-5 for each query vector (vec_id < 5).
    "s01_cosine_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cs"), 6).desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cs", VectorFns.cosine(col("q_emb"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"), round(col("cs"), 4).as("cosine"), col("rank"))
    },

    // LSH-bucketed ANN: candidates restricted to the query's sign bucket,
    // exact top-3 within the bucket.
    "s02_lsh_ann" -> { (s, dir) =>
      val e = emb(s, dir)
        .withColumn("bucket", VectorFns.signBucket(col("embedding"), lshBits))
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("bucket").as("q_bucket"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(round(col("cs"), 6).desc, col("vec_id"))
      e.join(broadcast(q), col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cs", VectorFns.cosine(col("q_emb"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("q_id"), col("vec_id"), round(col("cs"), 4).as("cosine"), col("rank"))
    })

  val oracle: Map[String, String] = Map(
    "s01_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 5),
        |p AS (
        |  SELECT q_id, e.vec_id,
        |    list_dot_product(qv, v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cs
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q_id),
        |r AS (
        |  SELECT q_id, vec_id, cs,
        |    row_number() OVER (PARTITION BY q_id ORDER BY round(cs, 6) DESC, vec_id)::INT AS rank
        |  FROM p)
        |SELECT q_id, vec_id, round(cs, 4) AS cosine, rank FROM r WHERE rank <= 5""".stripMargin,

    "s02_lsh_ann" ->
      """WITH bk AS (
        |  SELECT vec_id,
        |    sum(CASE WHEN embedding[i + 1] > 0 THEN pow(2, i)::BIGINT ELSE 0 END)::BIGINT AS bucket
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(8)) AS i)
        |  GROUP BY vec_id),
        |e AS (
        |  SELECT e0.vec_id, embedding::DOUBLE[] AS v, bucket
        |  FROM embeddings e0 JOIN bk USING (vec_id)),
        |q AS (SELECT vec_id AS q_id, v AS qv, bucket AS qb FROM e WHERE vec_id < 5),
        |p AS (
        |  SELECT q_id, e.vec_id,
        |    list_dot_product(qv, v) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cs
        |  FROM e JOIN q ON e.bucket = qb AND e.vec_id <> q_id),
        |r AS (
        |  SELECT q_id, vec_id, cs,
        |    row_number() OVER (PARTITION BY q_id ORDER BY round(cs, 6) DESC, vec_id)::INT AS rank
        |  FROM p)
        |SELECT q_id, vec_id, round(cs, 4) AS cosine, rank FROM r WHERE rank <= 3""".stripMargin)
}
