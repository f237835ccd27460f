package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductF, Md5Hash32F, Md5Hash60F, MinHashSigF, SimHash64F, SimHashF, TokenCountF}

/** SQL surface for the engine's native codegen expressions, injected via
  * `SparkSessionExtensions` — set
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and the hot-path
  * expressions become callable from pure SQL.
  *
  * Caveat worth knowing: `spark.sql.extensions` is a STATIC conf — it
  * only takes effect when the SparkContext itself is created with it
  * (spark-submit `--conf`, or the first builder in the JVM). Attaching to
  * an already-running context (shared notebook JVMs, test suites) must
  * use the programmatic `withExtensions` form on a fresh session.
  *
  * Functions:
  *
  *   - `dot_f(a, b)`        — float-array dot product ([[DotProductF]])
  *   - `minhash_sig(text)`  — one-pass MinHash signature ([[MinHashSigF]])
  *   - `simhash32(text)`    — one-pass 32-bit SimHash ([[SimHashF]])
  *   - `simhash64(text)`    — one-pass 64-bit SimHash as two unsigned
  *                            32-bit halves `[hi, lo]` ([[SimHash64F]])
  *   - `md5_32(s)`          — portable 32-bit md5-prefix hash ([[Md5Hash32F]])
  *   - `md5_60(s)`          — portable 60-bit md5-prefix join-key hash ([[Md5Hash60F]])
  *   - `token_count(text)`  — zero-allocation whitespace token count ([[TokenCountF]])
  *
  * This is the integration path for `spark.sql(...)`-only users (BI tools,
  * Thrift/Connect servers, notebook SQL cells) who never touch the Scala
  * Column API: the same whole-stage-codegen expressions the DataFrame
  * helpers in [[graft.functions.TextFns]]/[[graft.functions.VectorFns]]
  * wrap, with no UDF/serialization penalty. Registration is per-session
  * and idempotent (`injectFunction` replaces on re-apply), so pooled
  * sessions re-applying extensions are safe.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", classOf[DotProductF]),
      (args: Seq[Expression]) => {
        require(args.size == 2, s"dot_f takes 2 arguments, got ${args.size}")
        DotProductF(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", classOf[MinHashSigF]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"minhash_sig takes 1 argument, got ${args.size}")
        MinHashSigF(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("md5_32"),
      info("md5_32", classOf[Md5Hash32F]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"md5_32 takes 1 argument, got ${args.size}")
        Md5Hash32F(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("md5_60"),
      info("md5_60", classOf[Md5Hash60F]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"md5_60 takes 1 argument, got ${args.size}")
        Md5Hash60F(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("token_count"),
      info("token_count", classOf[TokenCountF]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"token_count takes 1 argument, got ${args.size}")
        TokenCountF(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", classOf[SimHashF]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"simhash32 takes 1 argument, got ${args.size}")
        SimHashF(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", classOf[SimHash64F]),
      (args: Seq[Expression]) => {
        require(args.size == 1, s"simhash64 takes 1 argument, got ${args.size}")
        SimHash64F(args.head)
      }))
  }
}
