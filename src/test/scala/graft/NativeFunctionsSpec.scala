package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CountInSet, LangBest, Registry}

/** Unit coverage for the native Catalyst expressions: edge cases and
  * interpreted-vs-codegen agreement (queries exercise the codegen
  * path; `eval` on a whole-stage-codegen-disabled plan exercises the
  * interpreted one — both must agree).
  */
class NativeFunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Engine.builder("local[4]", 4).getOrCreate()

  private def run(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def bothPaths(build: => org.apache.spark.sql.DataFrame): Unit = {
    Registry.ensure(spark)
    val codegen = run(build)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run(build) == codegen, "interpreted path diverged from codegen")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("graft_count_in: counts members, ignores non-members and nulls") {
    import spark.implicits._
    bothPaths {
      Seq(("the cat and the hat", 1), ("", 2), ("xyz", 3))
        .toDF("text", "id")
        .select($"id", call_function("graft_count_in",
          split($"text", " "),
          lit(Seq("the", "and").mkString(CountInSet.Delimiter))).as("n"))
        .orderBy($"id")
    }
    Registry.ensure(spark)
    import org.apache.spark.sql.Row
    val got = Seq(("the cat and the hat", 1)).toDF("text", "id")
      .select(call_function("graft_count_in", split($"text", " "),
        lit(Seq("the", "and").mkString(CountInSet.Delimiter))))
      .collect()
    assert(got.toSeq == Seq(Row(3L)))
  }

  test("graft_lang_best: argmax with first-listed tie-break, unknown on zero") {
    import spark.implicits._
    val spec = LangBest.encode(Seq(
      "en" -> Seq("the", "is"), "es" -> Seq("el", "es")))
    bothPaths {
      Seq(
        (1, "the dog is here"),     // en 2, es 0 -> en
        (2, "el perro es grande"),  // en 0, es 2 -> es
        (3, "the el"),              // tie 1-1 -> first listed (en)
        (4, "nothing matches"),     // all zero -> unknown
        (5, ""))                    // empty -> unknown
        .toDF("id", "text")
        .select($"id", call_function("graft_lang_best",
          split($"text", " "), lit(spec)).as("lang"))
        .orderBy($"id")
    }
    Registry.ensure(spark)
    val got = Seq((1, "the dog is here"), (3, "the el"), (4, "zzz"))
      .toDF("id", "text")
      .select(call_function("graft_lang_best", split($"text", " "), lit(spec)))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "en", "unknown"))
  }

  test("graft_regexp_groups: all groups from one match, empty on no match") {
    import spark.implicits._
    val pat = """(\w+)-(\d+)"""
    bothPaths {
      Seq((1, "abc-42 tail"), (2, "no digits"), (3, ""))
        .toDF("id", "s")
        .select($"id", explode(array(call_function("graft_regexp_groups",
          $"s", lit(pat)))).as("g"))
        .select($"id", $"g"(0).as("a"), $"g"(1).as("b"))
        .orderBy($"id")
    }
    Registry.ensure(spark)
    import org.apache.spark.sql.Row
    val got = Seq((1, "abc-42 tail"), (2, "no digits"))
      .toDF("id", "s")
      .select($"id", call_function("graft_regexp_groups", $"s", lit(pat)).as("g"))
      .orderBy($"id")
      .collect().map(r => r.getSeq[String](1)).toSeq
    assert(got == Seq(Seq("abc", "42"), Seq("", "")))
  }

  test("graft_nfc: composes decompositions, identity on normalized text, idempotent") {
    import spark.implicits._
    val decomposed = "Cafe\u0301 au lait" // e + COMBINING ACUTE ACCENT
    val composed = "Caf\u00e9 au lait"     // precomposed e-acute
    bothPaths {
      Seq((1, decomposed), (2, composed), (3, "plain ascii"), (4, ""),
          (5, "日本語 🙂 עברית"))
        .toDF("id", "s")
        .select($"id", call_function("graft_nfc", $"s").as("n"))
        .orderBy($"id")
    }
    Registry.ensure(spark)
    val got = Seq((1, decomposed), (2, composed))
      .toDF("id", "s")
      .select(call_function("graft_nfc", $"s").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got(0) == composed, "decomposed form not composed to NFC")
    assert(got(1) == composed, "already-NFC text changed")
    // idempotency: nfc(nfc(x)) == nfc(x)
    val twice = Seq(Tuple1(decomposed)).toDF("s")
      .select(call_function("graft_nfc",
        call_function("graft_nfc", $"s")).as("n"))
      .collect()(0).getString(0)
    assert(twice == composed)
  }

  test("graft_rolling_fp: every mode matches its HOF twin on real corpus text") {
    Registry.ensure(spark)
    import graft.sources.Tables
    val w = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.operators.TextAnalysis.tokens(col("text")).as("w"))
    def rfp(k: Int, s: Int, m: String) =
      call_function("graft_rolling_fp", col("w"), lit(k), lit(s), lit(m))
    // md5 rolling windows (q124/q98/q128 shape), k = 8
    val md5Twin = transform(sequence(lit(1), size(col("w")) - 7), i =>
      md5(concat_ws(" ", (0 until 8).map(j => element_at(col("w"), i + j)): _*)))
    assert(w.filter(size(col("w")) >= 8)
      .select(rfp(8, 1, "md5").as("a"), md5Twin.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0,
      "md5 windows diverged from the HOF twin")
    // xx rolling windows, k = 8
    val xxTwin = transform(sequence(lit(1), size(col("w")) - 7), i =>
      xxhash64(concat_ws(" ", (0 until 8).map(j => element_at(col("w"), i + j)): _*)))
    assert(w.filter(size(col("w")) >= 8)
      .select(rfp(8, 1, "xx").as("a"), xxTwin.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0,
      "xxhash64 windows diverged from the HOF twin")
    // string shingles (shinglesOf shape), n = 3
    val strTwin = transform(sequence(lit(1), size(col("w")) - 2), i =>
      concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1),
        element_at(col("w"), i + 2)))
    assert(w.filter(size(col("w")) >= 3)
      .select(rfp(3, 1, "str").as("a"), strTwin.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0,
      "string shingles diverged from the HOF twin")
    // span tiles (q122 shape), span = 5, partial last window
    val tileTwin = transform(
      sequence(lit(0), ceil(size(col("w")) / lit(5.0)).cast("int") - 1),
      p => concat_ws(" ", slice(col("w"), p * 5 + 1, lit(5))))
    assert(w.filter(size(col("w")) >= 1)
      .select(rfp(5, 5, "str").as("a"), tileTwin.as("b"))
      .filter(!(col("a") <=> col("b"))).count() == 0,
      "span tiles diverged from the HOF twin")
    // short-doc edge: n < width yields an empty array in stride-1 mode
    import spark.implicits._
    val short = Seq(Tuple1(Seq("a", "b"))).toDF("w")
    assert(short.select(rfp(3, 1, "md5")).collect()(0)
      .getSeq[Any](0).isEmpty)
    // null token array propagates null
    val nul = Seq(Tuple1(Option.empty[Seq[String]])).toDF("w")
    assert(nul.select(rfp(3, 1, "md5")).collect()(0).isNullAt(0))
  }

  test("native expressions propagate null inputs as null") {
    Registry.ensure(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Option.empty[String])).toDF("s")
    assert(df.select(call_function("graft_count_in",
      split($"s", " "), lit("x"))).collect()(0).isNullAt(0))
    assert(df.select(call_function("graft_regexp_groups",
      $"s", lit("(x)"))).collect()(0).isNullAt(0))
    assert(df.select(call_function("graft_nfc", $"s"))
      .collect()(0).isNullAt(0))
  }
}
