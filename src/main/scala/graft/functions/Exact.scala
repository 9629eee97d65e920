package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * Floating-point SUM/AVG is order-dependent, and a distributed Spark
  * aggregation will not combine partials in the same order as a
  * single-node engine — so double aggregates can differ in the last
  * ulps between runs and between engines. All source numeric columns
  * in this engine's tables carry fixed decimal scale (money/measures
  * are 2-decimal), so we aggregate *exactly* in decimal and only cast
  * the final value to double. Decimal addition is associative —
  * byte-identical results on any cluster size, and identical to a
  * DuckDB/Trino oracle computing the same expression.
  *
  * This also matters at 100 TB: a reproducible aggregate means retried
  * stages and speculative tasks cannot produce run-to-run drift.
  */
object Exact {
  private val D = DecimalType(18, 2)

  /** Cast a scale-2 source column to exact decimal. Products/sums of
    * `dec` operands stay exact until the final cast to double —
    * multiply *decimals*, never doubles, or the pre-cast double
    * rounding diverges from an exact-arithmetic oracle.
    */
  def dec(c: Column): Column = c.cast(D)

  /** Exact sum of a fixed-scale(2) numeric column, returned as double.
    * NULLs are skipped like SQL SUM; NaN casts to decimal NULL (non-ANSI)
    * and is therefore also skipped — callers with NaN-bearing inputs
    * should clean via `nanvl` first (see Ingest.normalize).
    */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact sum of an already-decimal expression (e.g. a product of
    * [[dec]] operands), returned as double.
    */
  def dsumExpr(e: Column): Column = sum(e).cast("double")

  /** Exact average: exact decimal sum divided (in double) by the
    * non-null count — matching SQL AVG semantics on nullable input.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact sum of squares (scale-2 input -> scale-4 exact square). */
  def dsumsq(c: Column): Column = {
    val d = c.cast(D)
    sum(d * d).cast("double")
  }

  /** SQL fragments for the DuckDB oracle, mirroring the same casts. */
  object sql {
    def dsum(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
    def davg(c: String): String = s"${dsum(c)} / COUNT($c)"
    def dsumsq(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  }
}
