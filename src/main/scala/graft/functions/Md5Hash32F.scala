package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 32-bit hash — the
  * first 8 hex chars of md5(s) as an unsigned 32-bit value in a Long —
  * computed straight from the digest bytes.
  *
  * The declarative form this replaces,
  * `conv(substring(md5(s), 1, 8), 16, 10).cast("long")`, materializes a
  * 32-char hex string per call, substrings it, and re-parses the prefix
  * back to binary — three expression nodes and two string allocations
  * around a digest whose first four bytes already ARE the value. The hash
  * is the inner loop of the sampling/dedup/sketch family (w01–w07 gates,
  * x03's 4-row probe, x04's per-token hash, t04's min-shingle-hash), so
  * the constant factor is scan-dominant at 100 TB. Value parity is exact
  * by construction: hex chars 1–8 of the digest = digest bytes 0–3
  * big-endian, the same [[TextHash.md5_32]] core the MinHash/SimHash
  * signature expressions already use — one copy of the contract, no
  * drift. Null in → null out (UnaryExpression null intolerance), matching
  * the composed chain where md5(null) is null.
  *
  * Seeded/keyed variants stay in [[TextFns]] as `concat` prefixes over
  * this expression — the prefix is part of the PORTABLE oracle contract
  * ('seed:'||s in DuckDB), not of the hash kernel.
  */
case class Md5Hash32F(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_32 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_32"

  override def nullSafeEval(input: Any): Any =
    TextHash.md5_32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHash.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.md5_32($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32F =
    copy(child = newChild)
}
