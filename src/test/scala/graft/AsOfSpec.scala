package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

/** Edge cases for the as-of join: inclusivity at equal timestamps,
  * null payload when no prior right row exists, key isolation.
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.builder("local[4]", 4).getOrCreate()
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join: inclusive match, strictly-later excluded, keys isolated") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0))
      .toDF("q_key", "q_time", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "exact"),     // == first quote → inclusive
      (1L, ts("2024-01-01 10:04:59"), "between"),   // after q1, before q2
      (1L, ts("2024-01-01 09:59:59"), "before"),    // before any quote → null
      (2L, ts("2024-01-01 10:03:00"), "otherkey"))  // must see key-2 quote only
      .toDF("t_key", "t_time", "tag")
    val out = AsOf.joinAsOf(trades, quotes,
        leftKey = "t_key", rightKey = "q_key",
        leftTime = "t_time", rightTime = "q_time",
        payload = Seq("price"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("exact") == Some(100.0), "equal timestamps must match (inclusive)")
    assert(out("between") == Some(100.0), "must take latest quote <= trade time")
    assert(out("before") == None, "no prior quote -> null payload")
    assert(out("otherkey") == Some(200.0), "must not leak across keys")
  }

  test("asof join output row count equals left row count") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q48_asof_join")(spark, dir)
    assert(out.count() == sources.Tables.events(spark, dir).count())
  }
}
