package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys as pure column math — the multi-dimensional
  * clustering key behind `OPTIMIZE ZORDER BY` in lakehouse engines: sort
  * or range-partition a table by `interleave(a, b)` and BOTH columns'
  * parquet min/max footer stats become selective, so a filter on EITHER
  * dimension prunes files (a single-column sort only prunes its own
  * column; see ZOrderSpec for the measured file-count proof).
  *
  * The bit spread is the classic 5-step magic-mask dilation (compiled by
  * Catalyst into straight-line codegen — no UDF, no loop), restricted to
  * the low 31 bits per operand so the interleaved key stays a NON-NEGATIVE
  * long (bit 62 is the top; a negative key would order before zero and
  * shred the curve's locality under signed sorting).
  */
object ZOrder {

  private val Masks = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Dilate the low 31 bits of `x` into the even bit positions 0,2,…,60. */
  private def spread(x: Column): Column =
    Masks.foldLeft(x.bitwiseAND(lit(0x7FFFFFFFL))) {
      case (acc, (sh, mask)) =>
        acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
    }

  /** Interleave the low 31 bits of `a` (even positions) and `b` (odd
    * positions) into one non-negative long: the 2-D Morton key.
    * Equivalent to Σᵢ ((a≫i)&1)·2^(2i) + ((b≫i)&1)·2^(2i+1) — the form
    * the DuckDB oracle computes, bit-identical by construction.
    */
  def interleave(a: Column, b: Column): Column =
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
}
