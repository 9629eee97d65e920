package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is the
  * explicit fallback for *aggregation* skew, where one hot key would
  * otherwise serialize into a single reducer. Two-phase plan:
  * partial-aggregate on (key, salt), then merge per key — the hot
  * key's work spreads over `salts` reducers and the second shuffle
  * only moves `|keys| × salts` pre-aggregated rows.
  */
object Skew {

  /** Salted count+sum aggregation over a possibly-skewed key. The
    * result is identical to a direct groupBy (counts/sums are
    * mergeable; decimal sums keep it exact), only the shuffle shape
    * differs.
    *
    * The salt is a content hash of a caller-provided stable row id —
    * NOT `monotonically_increasing_id()`, whose values depend on
    * partition layout, so a task retry after a fetch failure would
    * re-salt recomputed rows differently and corrupt the two-phase
    * aggregation (the SPARK-23207 failure class).
    */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, idCol: String,
                salts: Int = 16): DataFrame = {
    import graft.functions.Exact.dec
    df
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(salts)))
      .groupBy(col(key), $"_salt")
      .agg(count(lit(1)).as("_n"), sum(dec(col(valueCol))).as("_s"))
      .groupBy(col(key))
      .agg(sum($"_n").as("n"), sum($"_s").cast("double").as("sum_value"))
      .orderBy(col(key))
  }

  /** Salted fact⋈dim equi-join for a skewed fact key: the fact side
    * salts on a stable row-content hash (retry-stable, like
    * [[saltedAgg]]) and the dim side replicates each row `salts` ways,
    * so one hot key's rows spread over `salts` reducers instead of
    * serializing into one. Result set is identical to the direct join —
    * only the shuffle shape differs (dim grows ×salts, which is the
    * deliberate trade: dims are small). AQE's skew splitting covers
    * the same ground adaptively; this is the explicit, planner-
    * independent form for when the skew is known up front.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 idCol: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact
      .withColumn("_salt", pmod(xxhash64(col(idCol)), lit(salts)))
    val replicatedDim = dim
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "_salt"))
      .drop("_salt")
  }
}
