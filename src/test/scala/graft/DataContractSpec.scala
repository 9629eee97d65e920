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

  // The column set each table must expose — these names are baked
  // into every operator and every DuckDB oracle, so a regen that
  // drops or renames one must go red HERE with the table named, not
  // as a scatter of unresolved-column errors mid-suite.
  private val canonicalCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("every canonical table loads non-empty with its full column set") {
    for (d <- sfDirs; t <- Tables.names) {
      val df = if (t == "events") Tables.events(spark, d)
               else Tables.load(spark, d, t)
      val missing = canonicalCols(t) -- df.columns.toSet
      assert(missing.isEmpty,
        s"$d/$t: regen dropped or renamed columns $missing")
      assert(df.limit(1).count() == 1L, s"$d/$t: table is empty")
    }
  }

  test("documents.text is non-null in every SF dir (the dedup-convention contract)") {
    // The dedup family treats empty text as one ""-token document
    // (lineDedup's convention, matched by every oracle) but treats
    // NULL text as out-of-contract: substrRemovalAgainst's
    // size(w) >= 1 guard drops such a row, while the DuckDB oracle's
    // LEFT JOIN from toks would keep it with NULL n_tokens — a
    // latent cross-engine divergence (r16 ADVICE). This pin makes
    // the convention enforceable: a regen that lands NULL texts goes
    // red HERE, not as a q124 hash mismatch in the driver's gate.
    import org.apache.spark.sql.functions.col
    for (d <- sfDirs) {
      val nNull = Tables.load(spark, d, "documents")
        .filter(col("text").isNull).count()
      assert(nNull == 0L,
        s"$d: $nNull NULL-text documents — the dedup operators' " +
          "non-null text convention no longer holds; either clean the " +
          "regen or coalesce text to '' in BOTH engines")
    }
  }

  test("operator-critical dtypes hold in every SF dir") {
    import org.apache.spark.sql.types._
    for (d <- sfDirs) {
      // Similarity/Dedup fold over Array[Float] — a regen that lands
      // double-element vectors changes every cosine beyond parity
      val emb = Tables.load(spark, d, "embeddings").schema("embedding")
      assert(emb.dataType == ArrayType(FloatType, containsNull = true) ||
        emb.dataType == ArrayType(FloatType, containsNull = false),
        s"$d: embeddings.embedding is ${emb.dataType}, not array<float>")
      val doc = Tables.load(spark, d, "documents").schema
      assert(doc("doc_id").dataType == LongType &&
        doc("text").dataType == StringType,
        s"$d: documents key/text dtype drift " +
          s"(${doc("doc_id").dataType}, ${doc("text").dataType})")
      // the date-era contract: order/ship dates must CAST to
      // session-TZ timestamp (the engine's unix_micros path) — both
      // NTZ (current era) and plain timestamp satisfy this
      val casted = Tables.orders(spark, d)
        .select(org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp")))
      casted.queryExecution.analyzed
    }
  }

  test("a not-yet-populated events source opens on the fallback schema") {
    val d = java.nio.file.Files.createTempDirectory("graft_empty_src").toString
    val wm = EventStream.readEventStream(spark, d)
      .withWatermark("ts", "10 minutes")
    assert(wm.isStreaming && wm.schema("ts").dataType == TimestampType)
  }

  test("a matched-but-uncommitted events source opens on the fallback schema") {
    // the startup race the round-11 narrowing reintroduced: the
    // producer has CREATED events.parquet (so the glob matches) but
    // committed no data yet — only a _temporary spill, a _SUCCESS
    // marker, and a still-zero-length part file. Schema inference
    // would throw "Unable to infer schema"; open must treat this like
    // an unmatched glob and start the stream on the declared schema.
    val d = java.nio.file.Files.createTempDirectory("graft_midwrite_src")
    val src = d.resolve("events.parquet")
    java.nio.file.Files.createDirectories(src.resolve("_temporary").resolve("0"))
    java.nio.file.Files.write(
      src.resolve("_temporary").resolve("0").resolve("part-00000"),
      "in-flight bytes".getBytes)
    java.nio.file.Files.write(src.resolve("_SUCCESS"), Array.empty[Byte])
    java.nio.file.Files.write(
      src.resolve("part-00000-open.snappy.parquet"), Array.empty[Byte])
    val wm = EventStream.readEventStream(spark, d.toString)
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
