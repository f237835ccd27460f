package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Oracle-checked slice of the multimodal surface (SURVEY LLM-extension):
  * media travels as opaque `binary` columns + typed metadata, and every
  * metadata derivation (hashing, sizing, slicing, transport encoding) is
  * columnar and codegen'd — the payload is never interpreted driver-side.
  * The codec boundary itself (decode/resize/frame-sample) lives in
  * `graft.multimodal` behind `mapPartitions`; here the relational part of
  * the contract gets a DuckDB oracle over bytes derived from `documents`.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Binary-column metadata: content addressing (md5), byte sizing, head
    // slice via hex transport encoding — the dedup/partition keys of a
    // binary media lake, computed without decoding payloads.
    "m01_binary_meta" -> { (s, dir) =>
      val bin = col("text").cast("binary")
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          md5(bin).as("content_md5"),
          length(bin).as("n_bytes"),
          substring(hex(bin), 1, 24).as("head_hex"))
    },

    // Storage-layout planning for a binary media lake: blobs binned into
    // power-of-two size classes (class = bit length of the byte count —
    // exact integer math, no float log2). The per-class histogram is what
    // sizes row groups / picks small-file compaction targets before a
    // 100 TB media ingest; one scan, one tiny aggregate.
    "m02_size_classes" -> { (s, dir) =>
      val payload = col("text").cast("binary")
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), length(payload).as("n_bytes"))
        .withColumn("size_class", length(bin(col("n_bytes"))))
        .groupBy(col("size_class"))
        .agg(count(lit(1)).as("n_blobs"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
    })

  val oracle: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
        | md5(text) AS content_md5,
        | octet_length(encode(text))::INT AS n_bytes,
        | substring(hex(encode(text)), 1, 24) AS head_hex
        |FROM documents""".stripMargin,

    "m02_size_classes" ->
      """WITH b AS (
        |  SELECT doc_id, octet_length(encode(text))::INT AS n_bytes
        |  FROM documents)
        |SELECT length(bin(n_bytes))::INT AS size_class,
        | count(1)::BIGINT AS n_blobs,
        | sum(n_bytes)::BIGINT AS total_bytes,
        | min(n_bytes) AS min_bytes,
        | max(n_bytes) AS max_bytes
        |FROM b GROUP BY 1""".stripMargin)
}
