package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit hash — the
  * first 15 hex chars of md5(s) as an unsigned 60-bit value in a Long.
  *
  * This is the CORPUS-SCALE JOIN-KEY hash: where [[Md5Hash32F]] is the
  * cheap per-row gate/sketch hash (32 bits collide at birthday ~2¹⁶ —
  * fine for sampling gates, fatal for join identity over 10⁸⁺ distinct
  * keys), a 60-bit space puts the expected colliding pair count for a
  * 2×10⁸-distinct-shingle corpus at ~0.02. Shipping the hash instead of
  * the shingle STRING through an inverted-index shuffle (d04's self-join)
  * cuts the shuffled bytes ~5× and removes variable-length payloads from
  * the sort path entirely — probe-measured as the difference between d20
  * aborting and completing the 5M-doc decade on one box. 60 bits, not 64:
  * the top bit of a 64-bit value is BIGINT's sign in the DuckDB oracle,
  * so the identical `('0x'||substr(md5(s),1,15))::BIGINT` would overflow
  * half the time at 16 hex chars; 15 chars is the widest overflow-safe
  * prefix, same reasoning as [[SimHash64F]]'s two-half carry.
  *
  * Value parity is exact by construction: hex chars 1–15 of the digest =
  * the packed 64-bit prefix shifted right 4 ([[TextHash.md5_60]], the
  * same shared digest core as every other hash expression — one copy of
  * the contract, no drift). Null in → null out, matching the composed
  * chain where md5(null) is null.
  */
case class Md5Hash60F(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_60 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_60"

  override def nullSafeEval(input: Any): Any =
    TextHash.md5_60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.md5_60($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60F =
    copy(child = newChild)
}
