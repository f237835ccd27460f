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
  * Skew: [[backward]] partitions by the equi-key alone — with a
  * low-cardinality key (e.g. a handful of configurations) one partition
  * absorbs the whole fact side at scale. [[backwardBucketed]] is the skew
  * path: it composes the key with a coarse time bucket so every window
  * partition is bounded by (key x bucket), and repairs the bucket boundaries
  * by carrying each bucket's latest right payload forward over the (small)
  * per-(key, bucket) spine and injecting it as a synthetic first row of the
  * next bucket. Identical results, bounded partitions.
  *
  * The right payload travels as a single struct column so all attached fields
  * are guaranteed to come from the same matched row.
  *
  * Requirements: key + payload column names must not collide between sides
  * (rename right columns first — which also documents what the join
  * attaches), and neither side may use the reserved internal names
  * `__t`, `__tag`, `__r`, `__m`, `__b`.
  *
  * @param tieBreak right column names; among right rows with equal time the
  *                 one with the greatest tieBreak tuple wins (deterministic).
  */
object AsOfJoin {

  private val reserved = Set("__t", "__tag", "__r", "__m", "__b")

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "inner",
      tieBreak: Seq[String] = Nil): DataFrame =
    core(left, right, keys, leftTime, rightTime, joinType, tieBreak, bucketOf = None)

  /** [[backward]] with window partitions bounded by a coarse time bucket —
    * the low-cardinality-key skew path. `bucketOf` maps a time column to a
    * bucket id and MUST be monotone in time (e.g.
    * `c => floor(unix_timestamp(c) / (30 * 86400))` for ~monthly buckets).
    * Result is identical to [[backward]] for any monotone bucketing. */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      bucketOf: Column => Column,
      joinType: String = "inner",
      tieBreak: Seq[String] = Nil): DataFrame =
    core(left, right, keys, leftTime, rightTime, joinType, tieBreak, Some(bucketOf))

  private def core(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String,
      tieBreak: Seq[String],
      bucketOf: Option[Column => Column]): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported joinType $joinType")
    // a right row with null time cannot satisfy rightTime <= leftTime, but
    // under asc ordering nulls sort FIRST and its payload would attach to
    // every left row with no real predecessor — drop such rows up front
    val rightValid = right.filter(col(rightTime).isNotNull)
    val leftOther = left.columns.toSeq.filterNot(keys.contains)
    val rightOther = rightValid.columns.toSeq.filterNot(keys.contains)
    val collisions = leftOther.toSet.intersect(rightOther.toSet)
    require(collisions.isEmpty, s"column collisions between sides: $collisions")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty, s"input uses reserved internal column names: ${clash.mkString(", ")}")

    val payloadType = StructType(rightValid.select(rightOther.map(col): _*).schema.fields)
    val timeType = left.schema(leftTime).dataType
    val nullLeft = leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c))

    val leftTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag"),
          lit(null).cast(payloadType).as("__r")) ++
        leftOther.map(col): _*)
    val rightTagged = rightValid.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag"),
          struct(rightOther.map(col): _*).as("__r")) ++
        nullLeft: _*)

    val (unioned, partKeys) = bucketOf match {
      case None =>
        (leftTagged.unionByName(rightTagged), keys)
      case Some(bucket) =>
        val lb = leftTagged.withColumn("__b", bucket(col("__t")))
        val rb = rightTagged.withColumn("__b", bucket(col("__t")))
        // latest right payload per (key, bucket): one small row per group,
        // greatest (time, tieBreak) tuple wins — same tie rule as the window
        val latest = rb.groupBy(keys.map(col) :+ col("__b"): _*)
          .agg(max_by(col("__r"),
            struct(col("__t") +: tieBreak.map(tb => col("__r").getField(tb)): _*)).as("__r"))
        // bucket spine = every (key, bucket) either side touches, so carry
        // crosses buckets that have no right rows at all
        val spine = lb.select(keys.map(col) :+ col("__b"): _*).distinct()
          .unionByName(rb.select(keys.map(col) :+ col("__b"): _*).distinct())
          .distinct()
        // carry-in for bucket b = latest payload of any earlier bucket; the
        // window runs over the per-(key, bucket) spine — tiny by construction
        val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val carryIn = spine.join(latest, keys :+ "__b", "left")
          .withColumn("__m", last(col("__r"), ignoreNulls = true).over(wCarry))
          .filter(col("__m").isNotNull)
        // synthetic first row of each bucket: null time sorts before every
        // real timestamp under asc ordering, tag 0 keeps it on the right side
        val synthetic = carryIn.select(
          keys.map(col) ++
            Seq(col("__b"), lit(null).cast(timeType).as("__t"), lit(0).as("__tag"),
              col("__m").as("__r")) ++
            nullLeft: _*)
        (lb.unionByName(rb).unionByName(synthetic), keys :+ "__b")
    }

    val ord: Seq[Column] =
      Seq(col("__t").asc, col("__tag").asc) ++ tieBreak.map(tb => col("__r").getField(tb).asc)
    val w = Window.partitionBy(partKeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        keys.map(col) ++ leftOther.map(col) ++
          rightOther.map(c => col("__m").getField(c).as(c)): _*)

    if (joinType == "inner") matched.filter(col(rightTime).isNotNull) else matched
  }
}
