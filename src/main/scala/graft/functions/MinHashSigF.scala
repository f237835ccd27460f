package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full per-document MinHash signature —
  * distinct word-3-shingle count plus the six LSH band minima — in ONE
  * map-side pass over the text.
  *
  * The declarative form this replaces (explode(array_distinct(shingles))
  * -> md5 per shingle -> groupBy(doc_id).agg(count, min x 6)) shuffles the
  * EXPLODED shingle frame, which is larger than the corpus itself; at
  * 100 TB the signature stage alone re-shuffles more bytes than the input.
  * This expression makes signature generation embarrassingly parallel:
  * one row in, one row out, no explode, no aggregation exchange.
  *
  * Value parity with the declarative chain (and the DuckDB oracle) is
  * exact, clause by clause:
  *  - tokenization: `split(trim(text), "\\s+")` — UTF8String.trim()
  *    strips 0x20 only (Spark's `trim` semantics, NOT Java's
  *    `String.trim`), then Java regex split with limit -1, the same
  *    regex engine Spark's `split` uses;
  *  - shingles: k=3 consecutive tokens joined with ' ' (`concat_ws`),
  *    none when the document has fewer than 3 tokens;
  *  - distinctness: by exact string equality (`array_distinct`), counted
  *    into the signature's first slot;
  *  - hash: first 8 hex chars of md5(shingle) as an unsigned 32-bit
  *    value ([[TextFns.md5Hash32]]); band b in 1..6 takes
  *    min((h * (1000003 + 7919 b) + 104729 b) mod 2147483647) — products
  *    stay under 2^52, exact in Long in both engines.
  *
  * Returns array<long> of length 7: [distinct_shingle_count, mh1..mh6].
  * Documents with no shingles return NULL — the same docs the explode
  * form drops entirely (callers filter isNotNull, preserving the contract
  * that shingle-less docs never reach candidate generation).
  */
case class MinHashSigF(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSigF.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSigF.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, t => {
      s"""
         |${ev.value} = $cls.compute($t);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigF =
    copy(child = newChild)
}

object MinHashSigF {
  val NumBands = 6
  val ShingleK = 3
  private val Mod = 2147483647L

  /** One-pass signature; static so generated code can call it directly.
    * Returns null for documents with no 3-shingles (the rows the explode
    * form never emits). Tokenize/hash via the shared [[TextHash]] core. */
  def compute(text: UTF8String): ArrayData = {
    val toks = TextHash.tokenize(text)
    if (toks.length < ShingleK) return null
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder
    var c = 0L
    val mins = Array.fill(NumBands)(Long.MaxValue)
    var i = 0
    while (i + ShingleK - 1 < toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < ShingleK) { // body derives from ShingleK too — the
        if (k > 0) sb.append(' ') // constant is the single source of truth
        sb.append(toks(i + k)) // for d02/d04's shared shingle width
        k += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        c += 1
        val h = TextHash.md5_32(sh)
        var b = 1
        while (b <= NumBands) {
          val v = (h * (1000003L + b * 7919L) + b * 104729L) % Mod
          if (v < mins(b - 1)) mins(b - 1) = v
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Long](NumBands + 1)
    out(0) = c
    System.arraycopy(mins, 0, out, 1, NumBands)
    new GenericArrayData(out)
  }
}
