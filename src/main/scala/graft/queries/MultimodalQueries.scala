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
    })

  val oracle: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id,
        | md5(text) AS content_md5,
        | octet_length(encode(text))::INT AS n_bytes,
        | substring(hex(encode(text)), 1, 24) AS head_hex
        |FROM documents""".stripMargin)
}
