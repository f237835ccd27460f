package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built on SQL
  * higher-order functions so everything stays inside whole-stage codegen —
  * no UDF/serialization cost, which is what matters when scanning billions
  * of embeddings.
  *
  * Accumulation is in DOUBLE with left-to-right element order, which matches
  * DuckDB's `list_dot_product` on `DOUBLE[]` bit-for-bit (verified) — this is
  * the oracle-parity contract for every similarity query.
  */
object VectorFns {

  /** Σ a_i * b_i in double — the native codegen expression
    * [[DotProductF]]; same accumulation order/width as [[dotHof]]. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(DotProductF(expression(a), expression(b)))
  }

  /** Higher-order-function formulation of [[dot]] (kept as the reference
    * implementation / for engines without the custom expression). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-bit LSH bucket from the first `nBits` dimensions: bit i set iff
    * v[i] > 0. A deterministic bit-sampling LSH for cosine space — crude but
    * fully portable to the SQL oracle, and the bucketing pattern (hash ->
    * shuffle by bucket -> local exact search) is the real 100 TB ANN path.
    */
  def signBucket(v: Column, nBits: Int): Column = signBucketSlice(v, 0, nBits)

  /** [[signBucket]] over dims [start, start+nBits) — one LSH hash table per
    * disjoint dim slice gives the OR-amplified multi-table construction
    * (collide in ANY table → candidate), the embedding counterpart of
    * d02's MinHash bands. */
  def signBucketSlice(v: Column, start: Int, nBits: Int): Column =
    aggregate(
      zip_with(
        slice(v, start + 1, nBits),
        // shiftleft, NOT pow(2.0, i).cast("long"): the double 2^63
        // saturates the long cast to Long.MaxValue (= sum of bits 0..62),
        // silently merging the bit-63-only bucket with the all-lower-bits
        // one at a tables=1/bits=64 geometry.
        transform(sequence(lit(0), lit(nBits - 1)),
          i => call_function("shiftleft", lit(1L), i)),
        (x, p) => when(x > 0f, p).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc + b)
}
