package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the time-series operator relational
  * engines bolt on specially (DuckDB/QuestDB `ASOF JOIN`, kdb `aj`).
  * For each left row, attach the right row with the greatest right
  * time ≤ left time within the same key.
  *
  * Spark-first formulation: union both sides tagged, sort within key
  * by (time, side-tag), and propagate the last non-null right payload
  * with `last(..., ignoreNulls)` over the running window. This is the
  * merge phase of a sort-merge as-of join expressed declaratively —
  * one shuffle on the key, one in-partition sort, O(n+m) per key, no
  * range-join blowup. At 100 TB both inputs shuffle once on the join
  * key; state per key during the merge is a single right payload.
  */
object AsOf {

  /** @param left       left (probe) table
    * @param right      right (reference) table, ideally pre-deduped to
    *                   one row per (key, time)
    * @param leftKey/rightKey    equi-join key columns
    * @param leftTime/rightTime  event-time columns
    * @param payload    right columns to attach (aliased as given)
    */
  def joinAsOf(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val internal = Seq("_k", "_t", "_side", "_p", "_asof")
    require(!(leftCols ++ payload).exists(internal.contains),
      s"joinAsOf reserves column names ${internal.mkString(", ")}; " +
        "rename the conflicting input column")
    // SQL as-of semantics on NULLs: a right row with NULL key or NULL
    // time can never satisfy `l.t >= r.t AND l.k = r.k`, and must not
    // leak its payload via null-first ordering / null-key grouping
    val rightClean = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
    // The payload travels as ONE struct (null on left-side rows) and a
    // single last(ignoreNulls) propagates it atomically: a matched
    // right row's columns are never torn across different right rows,
    // and a NULL *inside* the matched row's payload stays NULL instead
    // of being backfilled from an older row.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    // tag: right rows sort before left rows at equal times, so a right
    // row at exactly t matches a left row at t (asof is inclusive)
    val l = left.select(
      col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(payloadType).as("_p") +: leftCols.map(col): _*)
    val r = rightClean.select(
      (col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(0).as("_side") +:
        struct(payload.map(col): _*).as("_p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    // _p as final sort key: when the right side has several rows at the
    // same (key, time), the propagated payload is the struct-greatest
    // one — a deterministic pick under any partitioning/retry, instead
    // of whichever row happened to sort last. (Struct ordering is
    // field-by-field; payloads with non-orderable fields, e.g. maps,
    // would need a caller-side dedup first.) Left rows carry a null _p
    // but sort among themselves only, where _p never matters.
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val merged = l.unionByName(r)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
    merged
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"_asof.$c").as(c)): _*)
  }
}
