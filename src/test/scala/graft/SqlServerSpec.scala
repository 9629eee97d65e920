package graft

import java.sql.DriverManager
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SqlServer

/** The BI surface: a real JDBC client (Hive wire protocol — what
  * Superset or any BI tool speaks) connects to the in-process Thrift
  * server and must see exactly what the engine computes directly.
  */
class SqlServerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("JDBC client over the Thrift endpoint matches direct engine SQL") {
    val port = 10000 + scala.util.Random.nextInt(40000)
    val server = SqlServer.start(spark, dir, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val sql =
        """SELECT n_name, count(*) AS n_cust
          FROM global_temp.customer JOIN global_temp.nation
            ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name"""
      // the server needs a moment to bind; retry the connect briefly
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 30) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(1000) }
      }
      assert(conn != null, s"could not connect to thrift server on $port")
      try {
        val rs = conn.createStatement().executeQuery(sql)
        val viaJdbc = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getString(1), r.getLong(2))).toList
        val direct = spark.sql(sql).collect()
          .map(r => (r.getString(0), r.getLong(1))).toList
        assert(viaJdbc == direct,
          s"jdbc=${viaJdbc.take(3)} direct=${direct.take(3)}")
        assert(viaJdbc.nonEmpty && viaJdbc.map(_._2).sum > 0)
      } finally conn.close()
    } finally server.close()
  }
}
