package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whitespace token COUNT —
  * `size(split(trim(text), "\s+", -1))` — without running the regex or
  * materializing the token array.
  *
  * The composed form allocates one UTF8String per token per row just to
  * take the array's length; for the counting-only call sites (sequence
  * packing's n_tokens, the shard/budget/mixture token sums) that is the
  * dominant scan cost at corpus scale. This expression counts field
  * boundaries in one pass over the string's bytes with zero allocations.
  *
  * Parity contract, replicated EXACTLY and property-tested against the
  * composed chain (which is also the DuckDB oracle's
  * `len(regexp_split_to_array(trim(text), '\s+'))` formulation):
  *  - trim strips 0x20 ONLY (UTF8String.trim / Spark `trim` semantics);
  *  - Java regex `\s` is the ASCII class {space, \t, \n, \x0B, \f, \r} —
  *    unicode whitespace (NBSP etc.) is TOKEN content, not a separator;
  *  - `split(s, "\s+", -1)` yields maximal-run fields INCLUDING an empty
  *    leading field when the (trimmed) string starts with non-space
  *    whitespace and an empty trailing field when it ends with one, and
  *    the empty string yields one empty field. Hence:
  *    count = #(non-ws runs) + (starts ws ? 1 : 0) + (ends ws ? 1 : 0),
  *    with the empty string special-cased to 1.
  * Null in → null out (UnaryExpression null intolerance), like the
  * composed chain.
  */
case class TokenCountF(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_count expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCountF.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenCountF.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = $cls.count($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCountF =
    copy(child = newChild)
}

object TokenCountF {

  /** Java-regex `\s`: the six ASCII whitespace bytes. All are < 0x80, so
    * byte-wise scanning of UTF-8 is exact — multi-byte code points never
    * contain these byte values in UTF-8. */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static so generated code calls it directly. */
  def count(text: UTF8String): Int = {
    val t = text.trim() // strips 0x20 only, Spark's `trim`
    val n = t.numBytes()
    if (n == 0) return 1 // split("", -1) -> [""]
    var fields = 0
    var inRun = false
    var i = 0
    while (i < n) {
      val ws = isWs(t.getByte(i)) // no byte-array copy per row
      if (!ws && !inRun) { fields += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    if (isWs(t.getByte(0))) fields += 1 // empty leading field
    if (isWs(t.getByte(n - 1))) fields += 1 // empty trailing field
    fields
  }
}
