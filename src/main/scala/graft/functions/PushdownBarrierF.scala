package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that BLOCKS predicate pushdown without blocking
  * whole-stage codegen.
  *
  * The one optimizer-visible difference from its child: `deterministic`
  * is false. `PushDownPredicates` (PushPredicateThroughNonJoin /
  * PushPredicateThroughJoin) only moves deterministic conjuncts, so a
  * `Filter(pushdown_barrier(cond))` stays exactly where the caller put
  * it — in particular ABOVE a `RepartitionByExpression` both sides of a
  * self-join must share (exchange reuse requires canonically identical
  * subtrees; a filter pushed below ONE side's exchange kills it).
  *
  * Value semantics are the child's, verbatim: `eval` and `doGenCode`
  * delegate, so unlike the `observe()`/CollectMetrics barrier this one
  * lives INSIDE the surrounding WholeStageCodegen span
  * (`CollectMetricsExec` does not implement `CodegenSupport` in Spark
  * 4.1.2 — its barrier forces a row-at-a-time boundary on the full
  * stream it guards, measured on d04's engaged-salt path, BENCH_NOTES
  * "Round 20").
  *
  * The nondeterminism flag is a white lie the caller must own: the
  * wrapped predicate MUST actually be deterministic (reordering it with
  * other filters is safe — that is the point), and the optimizer will
  * treat it as opaque — no constraint propagation, no constant folding,
  * no conversion to a join condition. Use it only where staying put is
  * the optimization.
  */
case class PushdownBarrierF(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def nullable: Boolean = child.nullable

  // the barrier: never foldable, never deterministic, never pushed
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def prettyName: String = "pushdown_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): PushdownBarrierF =
    copy(child = newChild)
}

object PushdownBarrierF {
  /** Column-API entry point: `df.filter(pushdownBarrier(cond))`. */
  def pushdownBarrier(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(PushdownBarrierF(expression(c)))
  }
}
