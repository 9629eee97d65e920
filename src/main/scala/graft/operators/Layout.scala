package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side lever the scan-side pruning
  * in q02 depends on. At 100 TB a table is pruned by FILE, not by row:
  * parquet min/max footers (and partition directories) let the scan
  * skip whole files when the predicate misses their value range, but
  * only if the layout put similar rows together. A single-column sort
  * gives one dimension perfect ranges and leaves every other dimension
  * scattered; a Z-ORDER (Morton) curve interleaves the bits of several
  * dimensions so each file covers a small rectangle in all of them at
  * once — queries filtering on ANY clustered dimension skip most
  * files. (Same design as the clustering step behind
  * Delta/Iceberg `ZORDER BY`; reference analogue: the reference's
  * Druid tier partitions rollups by time only — database_etl.py's
  * daily segments — which this operator generalizes to
  * multi-dimensional pruning.)
  */
object Layout {

  /** Morton/Z-value of two already-scaled non-negative dimensions:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Unrolled
    * over fixed bit positions so every term is a codegen'd
    * shift/mask — no lambda, no UDF; for `bits` = 8 the result is a
    * 16-bit key.
    */
  def zvalue(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Scale a non-negative dimension into [0, 2^bits) by global
    * min/max: `((v - min) * 2^bits) div (max - min + 1)`. The integer
    * division is expressed as `(n - n mod d) / d` so the double
    * division is exact (its operand is an exact multiple of d) —
    * bit-identical to DuckDB's `//` on the oracle side. Monotone, and
    * always strictly below 2^bits (the top value maps to
    * `(range-1)*2^bits div range`).
    */
  def scaleDim(v: Column, minV: Column, maxV: Column, bits: Int = 8): Column = {
    val n = (v - minV) * (1L << bits)
    val d = maxV - minV + lit(1L)
    ((n - pmod(n, d)) / d).cast("long")
  }

  /** Z-order layout manifest for orders on (o_custkey, order day)
    * (q103): scale both dimensions to 8 bits by their global min/max
    * (a 1-row broadcast stats pass), interleave into a 16-bit Morton
    * key, assign each row to one of 2^`bucketBits` files by the key's
    * TOP bits (contiguous curve ranges — exactly what
    * `repartitionByRange` on the z-value produces as file boundaries
    * at scale), and report each file's row count and per-dimension
    * min/max — the footer ranges a pruning scan would consult. The
    * spec quantifies the payoff: mean per-bucket custkey range is a
    * fraction of the full domain, and BOTH dimensions' ranges shrink
    * simultaneously (the thing no single-column sort achieves).
    *
    * Scale shape: one stats pass (map-side min/max, 1 row broadcast) +
    * one scan computing keys and aggregating 2^`bucketBits` groups —
    * map-side combine collapses each partition to ≤ 2^`bucketBits`
    * rows before the shuffle. The actual rewrite at 100 TB is
    * `repartitionByRange(nFiles, zvalue)` + write; this manifest IS
    * its pruning profile, and stays oracle-checkable.
    */
  /** Orders frame extended with the (o_custkey, order day) Morton key:
    * `day` (long, days since 1990-01-01), the 1-row broadcast global
    * min/max stats, the 8-bit scaled dims, and the 16-bit `z` key.
    * Shared by the q103 manifest and the [[zOrdered]] writer.
    */
  private[graft] def withZ(orders: DataFrame): DataFrame = {
    val stats = orders.agg(
      min($"o_custkey").as("min_ck"), max($"o_custkey").as("max_ck"),
      min(datediff($"o_orderdate".cast("date"), to_date(lit("1990-01-01"))))
        .as("min_day"),
      max(datediff($"o_orderdate".cast("date"), to_date(lit("1990-01-01"))))
        .as("max_day"))
    orders
      .withColumn("day",
        datediff($"o_orderdate".cast("date"), to_date(lit("1990-01-01")))
          .cast("long"))
      .crossJoin(broadcast(stats))
      .withColumn("xb", scaleDim($"o_custkey", $"min_ck", $"max_ck"))
      .withColumn("yb", scaleDim($"day", $"min_day".cast("long"),
        $"max_day".cast("long")))
      .withColumn("z", zvalue($"xb", $"yb"))
  }

  def zorderLayout(orders: DataFrame, bucketBits: Int = 6): DataFrame =
    withZ(orders)
      .withColumn("bucket", shiftrightunsigned($"z", 16 - bucketBits))
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"o_custkey").as("ck_min"), max($"o_custkey").as("ck_max"),
        min($"day").as("day_min"), max($"day").as("day_max"))
      .orderBy($"bucket")

  /** The actual z-ordered rewrite the q103 manifest profiles: range-
    * partition on the Morton key into `nFiles` output files, so each
    * file covers one contiguous curve segment — a small rectangle in
    * BOTH dimensions, which is what parquet min/max footers prune on.
    * ScaleTechniquesSpec writes this layout and measures the payoff
    * in anger: scans with a range predicate on EITHER dimension read
    * a fraction of the row groups a hash layout reads.
    */
  def zOrdered(orders: DataFrame, nFiles: Int): DataFrame =
    withZ(orders)
      .drop("min_ck", "max_ck", "min_day", "max_day", "xb", "yb")
      .repartitionByRange(nFiles, $"z")
}
