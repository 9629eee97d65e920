package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.streaming.EventStream

/** Dataset-era tripwires. The `events.ts` physical type has shipped
  * three ways across testdata regens (parquet TIMESTAMP(NANOS) —
  * surfaces as long under `nanosAsLong`; TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) — surfaces as TIMESTAMP_NTZ; plain
  * TIMESTAMP(MICROS)), and twice — rounds 8 and 9 — a regen landed a
  * type [[graft.sources.Tables.normalizeEventTs]] didn't cover and
  * the breakage shipped SILENTLY: every event-time query died in the
  * driver's bench while the suite stayed green, because nothing
  * pinned the loaded dtype and the streaming specs built their frames
  * in-memory. These specs are that missing tripwire — they go red on
  * physical-type drift BEFORE the driver's bench does, against every
  * SF dir the driver grades.
  */
class DataContractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.builder("local[4]", 4).getOrCreate()

  // every graded SF dir, plus the 10× dev point when present
  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1", "/tmp/sf1")
    .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))

  test("all graded SF dirs are present to pin") {
    assert(sfDirs.count(_.startsWith("/root/testdata")) == 3,
      s"graded SF dirs missing from /root/testdata — found only $sfDirs")
  }

  test("events.ts loads as session-TZ TimestampType in every SF dir") {
    for (d <- sfDirs) {
      val dt = Tables.events(spark, d).schema("ts").dataType
      assert(dt == TimestampType,
        s"$d: events.ts loaded as $dt, not TimestampType — the on-disk " +
          "physical type drifted past Tables.normalizeEventTs; add the " +
          "new era there before anything downstream runs")
    }
  }

  test("streaming open + watermark analyzes against every SF dir") {
    for (d <- sfDirs) {
      val wm = EventStream.readEventStream(spark, d)
        .withWatermark("ts", "10 minutes")
      assert(wm.isStreaming, s"$d: expected an unbounded source")
      assert(wm.schema("ts").dataType == TimestampType,
        s"$d: streamed ts surfaced as ${wm.schema("ts").dataType}")
      // force full analysis: EventTimeWatermark must accept the column
      wm.queryExecution.analyzed
    }
  }

  test("a not-yet-populated events source opens on the fallback schema") {
    val d = java.nio.file.Files.createTempDirectory("graft_empty_src").toString
    val wm = EventStream.readEventStream(spark, d)
      .withWatermark("ts", "10 minutes")
    assert(wm.isStreaming && wm.schema("ts").dataType == TimestampType)
  }

  test("a corrupt events source fails at open, not at stream runtime") {
    val d = java.nio.file.Files.createTempDirectory("graft_corrupt_src")
    java.nio.file.Files.write(d.resolve("events.parquet"),
      "this is not a parquet file".getBytes)
    // the round-10 catch-all caught every AnalysisException, so a
    // corrupt source silently started the stream on the fallback
    // schema and failed mid-batch where nothing names the bad file;
    // the open must throw instead
    intercept[Exception] {
      EventStream.readEventStream(spark, d.toString)
    }
  }
}
