package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical-LAYOUT helpers: the write-time clustering tricks that make
  * parquet min/max stats skip data at read time. io8 covers the
  * single-column case (sort by one key → disjoint per-file ranges);
  * Z-ORDERING is the multi-column generalization every lakehouse ships
  * (`OPTIMIZE ... ZORDER BY` in Delta, `rewrite_data_files` with a
  * z-order strategy in Iceberg): interleave the bits of two keys so the
  * sort order preserves LOCALITY IN BOTH dimensions — each file then
  * covers a small rectangle of (x, y) space, and a selective predicate
  * on EITHER column prunes most files via their footer stats. A plain
  * lexicographic (x, y) sort gives perfect x-skipping and ZERO
  * y-skipping; the z-curve trades a little of x's locality for most of
  * y's — the right layout when queries filter on either dimension.
  */
object Layout {

  /** The Morton (z-curve) value of two non-negative integer columns,
    * 16 bits each: bit i of `x` lands at position 2i, bit i of `y` at
    * 2i+1. Pure integer Column algebra — 32 shift/mask terms folded by
    * whole-stage codegen, engine-portable (no float anywhere), total
    * fits a LONG. Callers map their key domains into [0, 65535] first
    * (ranks, day numbers, bucketed ids); values above 16 bits simply
    * ignore the high bits, which only COARSENS locality, never breaks
    * correctness (the z value orders the write, it never filters).
    */
  def zValue16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(
          shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
}
