package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkSpec, SparkEntry}

/** Edge-case behavior the driver corpus cannot exercise: the test tables
  * contain no degenerate rows (zero vectors, empty documents), so these
  * build tiny parquet dirs of their own and run the REAL query entries
  * against them — the query code path, not a re-implementation.
  */
class QueryEdgeSpec extends SparkSpec {

  /** Write a miniature sf dir containing only the named table. */
  private def miniDir(table: String, rows: Seq[Row], schema: StructType): String = {
    val dir = Files.createTempDirectory("graft_edge").toString
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    dir
  }

  test("s05: an all-zero embedding quantizes to the zero vector instead of " +
      "dividing by zero, and scores 0 against every query") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType, nullable = false)))
    // vec_id 0 is a query vector (vec_id < 5 is the query set); 7 is a
    // corpus vector. Both zero + two normal vectors so ranking is exercised.
    val rows = Seq(
      Row(0L, Array.fill(4)(0f).toSeq, 0),
      Row(1L, Seq(1f, -2f, 3f, -4f), 0),
      Row(7L, Array.fill(4)(0f).toSeq, 0),
      Row(8L, Seq(2f, 2f, -1f, 0.5f), 0))
    val dir = miniDir("embeddings", rows, schema)
    val out = SparkEntry.queries("s05_quantized_ann")(spark, dir)
      .orderBy(col("q_id"), col("rank")).collect()
    // no NaN/null anywhere; the zero query's dots are all 0
    assert(out.nonEmpty)
    assert(out.forall(r => !r.isNullAt(2)), out.mkString("\n"))
    val zeroQ = out.filter(_.getLong(0) == 0L)
    assert(zeroQ.nonEmpty && zeroQ.forall(_.getLong(2) == 0L), zeroQ.mkString("\n"))
    // the zero corpus vector scores 0 against the nonzero query too
    val zeroCorpus = out.filter(r => r.getLong(0) == 1L && r.getLong(1) == 7L)
    assert(zeroCorpus.forall(_.getLong(2) == 0L), zeroCorpus.mkString("\n"))
  }

  test("m05: a document id exercising every frame-count residue emits " +
      "ceil(nFrames/2) sampled frames with stride-2 indices") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false),
      StructField("source", StringType, nullable = false),
      StructField("n_chars", LongType, nullable = false)))
    // ids 0..4 cover nFrames = 4..8 (4 + id % 5)
    val rows = (0L to 4L).map(id => Row(id, "x", "en", "s", 1L))
    val dir = miniDir("documents", rows, schema)
    val out = SparkEntry.queries("m05_frame_sample")(spark, dir).collect()
    val byDoc = out.groupBy(_.getLong(0))
    for (id <- 0L to 4L) {
      val nFrames = 4 + (id % 5).toInt
      val expected = (0 until nFrames by 2).toSet
      assert(byDoc(id).map(_.getInt(1)).toSet == expected,
        s"doc $id: ${byDoc(id).mkString(",")}")
    }
    // every frame decodes to 8x8 and the checksum is consistent with the
    // arithmetic the oracle uses: frame 0 of doc 0 has v(k) = (7k) % 256
    val f00 = out.find(r => r.getLong(0) == 0L && r.getInt(1) == 0).get
    assert(f00.getInt(2) == 8 && f00.getInt(3) == 8)
    val vs = (0 until 64).map(k => (7L * k) % 256)
    val ws = (0 until 64).map(k => (k / 16) * 4 + (k % 8) / 2 + 1)
    assert(f00.getLong(4) == vs.sum, s"sum_px ${f00.getLong(4)} != ${vs.sum}")
    val expectedCk = vs.zip(ws).map { case (v, w) => v * w }.sum
    assert(f00.getLong(5) == expectedCk,
      s"pool_checksum ${f00.getLong(5)} != $expectedCk")
  }
}
