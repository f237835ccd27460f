package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 32-bit Charikar SimHash of a document
  * in ONE map-side pass over its tokens.
  *
  * The declarative form this replaces (explode(tokens) -> md5 per token ->
  * groupBy(doc_id).agg(32 conditional sums)) shuffles the exploded token
  * frame — the corpus re-keyed one row per word — through an aggregation
  * exchange; at 100 TB the signature stage alone re-shuffles more bytes
  * than the input. This expression is one row in, one long out.
  *
  * Value parity with the declarative chain (and the DuckDB oracle's
  * formulation) is exact:
  *  - tokenization: `split(trim(text), "\\s+")` — UTF8String.trim()
  *    (0x20 only) + Java regex split, limit -1: ALL tokens count,
  *    duplicates weighted (classic Charikar), and an empty/whitespace-only
  *    document contributes its single empty-string token exactly like the
  *    explode form;
  *  - hash: first 8 hex chars of md5(token) as an unsigned 32-bit value
  *    ([[TextFns.md5Hash32]]);
  *  - vote: bit b of the result is set iff strictly more tokens have bit
  *    b set than clear ((hv / 2^b) % 2 == 1 equals (h >>> b) & 1 for
  *    h < 2^32).
  */
case class SimHashF(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashF.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHashF.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, t => s"$cls.compute($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashF =
    copy(child = newChild)
}

object SimHashF {

  /** One-pass 32-bit SimHash; static so generated code calls it directly.
    * Tokenize/hash via the shared [[TextHash]] core. */
  def compute(text: UTF8String): Long = {
    val toks = TextHash.tokenize(text)
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val h = TextHash.md5_32(toks(i)).toInt
      var b = 0
      while (b < 32) {
        if (((h >>> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }
}
