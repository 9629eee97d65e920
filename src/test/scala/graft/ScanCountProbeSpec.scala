package graft

// TEMPORARY dev probe — counts per-table parquet scans in every
// query's physical plan to find double-scan lineages; deleted once
// the findings are triaged.
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ScanCountProbeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.builder("local[4]", 4).getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("probe: queries that scan the same table more than once") {
    val tables = Seq("lineitem", "orders", "customer", "supplier", "part",
      "events", "documents", "embeddings", "nation", "region")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val multi = tables.flatMap { t =>
          val c = s"$t\\.parquet".r.findAllIn(plan).size
          if (c >= 2) Some(s"$t x$c") else None
        }
        if (multi.nonEmpty) println(s"[scan] $name: ${multi.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"[scan] $name: probe failed ${e.getClass.getSimpleName}")
      }
    }
  }
}
