package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 64-bit Charikar SimHash of a document
  * as TWO unsigned 32-bit halves, in ONE map-side pass over its tokens.
  *
  * Why 64 bits (the d08 scale fix): a banded Hamming search's candidate
  * volume is governed by its band-key space, which is FIXED by the
  * signature width — the 32-bit form's 4×8-bit bands give 4×256 = 1,024
  * keys at ANY corpus size, so bucket occupancy grows n/256 and candidate
  * products n²/256 (probe-measured ~2×10¹¹ pairs at 5M docs,
  * BENCH_NOTES.md "Round 16"). 64 bits banded 4×16 keeps the pigeonhole
  * guarantee (any pair within Hamming ≤ 3 of 64 bits agrees on ≥ 1 of the
  * 4 bands) while growing the key space to 4×65,536 — occupancy n/65,536,
  * candidate products down ~3×10⁶× at the 5M-doc decade.
  *
  * Why two halves, not one long: the natural single-value form would set
  * bit 63 for roughly half of all documents, which is the sign bit of
  * BIGINT/LongType — DuckDB's `pow(2,63)::BIGINT` overflows, and every
  * downstream `//`/`%`-arithmetic band extraction would need sign
  * gymnastics in both engines. Two 32-bit halves (`simhash_hi` = votes
  * over md5 hex chars 1-8, `simhash_lo` = chars 9-16) keep every value in
  * [0, 2³²) where the committed d03 oracle pattern is already exact.
  *
  * Value parity with the declarative form (explode(tokens) → two md5
  * hex-slice hashes per token → groupBy(doc_id) with 64 conditional sums,
  * the DuckDB oracle's formulation — see `DedupQueries.simhashSqlCtes`):
  *  - tokenization: `split(trim(text), "\\s+")` via [[TextHash.tokenize]]
  *    — ALL tokens count, duplicates weighted (classic Charikar), and an
  *    empty/whitespace-only document contributes its single empty-string
  *    token exactly like the explode form;
  *  - hash: [[TextHash.md5_64]] — hex chars 1-8 of md5(token) vote the hi
  *    half, chars 9-16 the lo half, both as unsigned 32-bit values;
  *  - vote: bit b of a half is set iff strictly more tokens have bit b of
  *    their corresponding hash half set than clear.
  *
  * Returns array<long> of length 2: [simhash_hi, simhash_lo]. Consumers
  * split it into two columns in one Project — common-subexpression
  * elimination keeps it a single `compute` call per row in codegen.
  *
  * The 32-bit [[SimHashF]] stays registered (`simhash32`) as the
  * compact-signature API; d03/d08/d20's near-dup chain runs on this one.
  */
case class SimHash64F(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64F.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64F.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, t => s"$cls.compute($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64F =
    copy(child = newChild)
}

object SimHash64F {

  /** One-pass two-half 64-bit SimHash; static so generated code calls it
    * directly. Tokenize/hash via the shared [[TextHash]] core. Bits 0..31
    * of the packed md5_64 value are the lo half, 32..63 the hi half; the
    * vote array mirrors that layout. */
  def compute(text: UTF8String): ArrayData = {
    val toks = TextHash.tokenize(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextHash.md5_64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (votes(b + 32) > 0) hi |= 1L << b
      if (votes(b) > 0) lo |= 1L << b
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }
}
