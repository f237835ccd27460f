package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for every left row, attach the single right row with
  * the greatest `rightTime <= leftTime` within the same equi-key group.
  *
  * Reference semantics: mask selection picks the mask whose date is the
  * nearest one not after the measurement date within a configuration
  * (`/root/reference/src/processstep_add_mask_file.py:34-81`, SURVEY §2.3 J2).
  *
  * Implementation: the *union trick*, not join+rank. Tag left and right rows,
  * union them, and in one window per key (ordered by time, right-before-left
  * on ties) carry the last non-null right payload forward. This needs exactly
  * ONE shuffle on the equi-key and never fans out rows, so it survives a
  * 100 TB fact side; the join+row_number alternative shuffles twice and
  * multiplies each left row by its key's right-side cardinality first.
  *
  * The right payload travels as a single struct column so all attached fields
  * are guaranteed to come from the same matched row.
  *
  * Requirements: key + payload column names must not collide between sides
  * (rename right columns first — which also documents what the join attaches).
  *
  * @param tieBreak right column names; among right rows with equal time the
  *                 one with the greatest tieBreak tuple wins (deterministic).
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "inner",
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    val leftOther = left.columns.toSeq.filterNot(keys.contains)
    val rightOther = right.columns.toSeq.filterNot(keys.contains)
    val collisions = leftOther.toSet.intersect(rightOther.toSet)
    require(collisions.isEmpty, s"column collisions between sides: $collisions")

    val payloadType = StructType(right.select(rightOther.map(col): _*).schema.fields)
    val leftTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
          lit(null).cast(payloadType).as("__r")) ++
        leftOther.map(col): _*)
    val rightTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"),
          struct(rightOther.map(col): _*).as("__r")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val ord: Seq[Column] =
      Seq(col("__t").asc, col("__tag").asc) ++ tieBreak.map(tb => col("__r").getField(tb).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = leftTagged.unionByName(rightTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        keys.map(col) ++ leftOther.map(col) ++
          rightOther.map(c => col("__m").getField(c).as(c)): _*)

    if (joinType == "inner") matched.filter(col(rightTime).isNotNull) else matched
  }
}
