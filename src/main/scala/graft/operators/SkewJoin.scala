package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY "skewed keys -> salting or AQE
  * skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; salting is the
  * explicit fallback when one key's volume exceeds what a single split can
  * absorb (or when AQE is unavailable, e.g. inside a streaming foreachBatch).
  * The big side gets a deterministic salt from a caller-chosen source column
  * (a unique id — NOT rand(), which breaks retry idempotency and result
  * reproducibility); the small side is replicated once per salt. The join
  * key space becomes (key, salt), spreading one hot key over `nSalts`
  * reducers.
  */
object SkewJoin {

  /** Join types preserving correctness under small-side replication: an
    * unmatched SMALL row appears once per salt, so right/full outer joins
    * would emit nSalts null-extended duplicates. */
  private val safeJoinTypes = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    require(safeJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti — '$joinType' would " +
        "duplicate unmatched replicated small-side rows once per salt")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not carry a __salt column (reserved internal name)")
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
