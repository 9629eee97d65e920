package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench output contract: the grading harness captures only
  * a bounded stdout tail (~2.9 KB) and parses the LAST JSON line, so
  * the printed summary must stay well under that no matter how many
  * queries the catalog grows to. Rounds 2 and 3 both shipped a line
  * that silently outgrew the window because nothing asserted the
  * bound — this spec is that assertion. Round 7 adds the failure
  * contract: a query that throws must surface as an error, never as
  * a fast success.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults: Seq[Bench.Outcome] =
    SparkEntry.queries.keys.toSeq.sorted.map(k => Bench.Outcome(k, 123.456789))

  test("summary line stays under 2.0 KB at the current catalog size") {
    val line = Bench.renderLine(
      fakeResults, "/root/testdata/sf0.1", "bench_detail.json")
    assert(line.length < 2000,
      s"bench summary line is ${line.length} bytes; driver tail is ~2.9 KB")
    // the bound must hold structurally, not by luck: the line carries
    // a fixed number of per-query entries regardless of catalog size
    val grown = Bench.renderLine(
      fakeResults ++ (1 to 200).map(i =>
        Bench.Outcome(f"q_future_$i%03d_extra", 1.0)),
      "/root/testdata/sf0.1", "bench_detail.json")
    assert(grown.length < 2000, "line size must not grow with the catalog")
  }

  test("summary line is valid single-line JSON with required fields") {
    val line = Bench.renderLine(
      fakeResults, "/root/testdata/sf0.1", "bench_detail.json")
    assert(!line.contains("\n"))
    assert(line.startsWith("{") && line.endsWith("}"))
    for (key <- Seq("\"metric\":", "\"value\":", "\"unit\":", "\"n\":",
                    "\"failed\":", "\"first_pass_total\":", "\"queries\":",
                    "\"sf\":"))
      assert(line.contains(key), s"missing $key")
    // queries carries exactly the 5 worst entries
    val qCount = "\"q\\d[^\"]*\":".r.findAllIn(
      line.substring(line.indexOf("\"queries\":"))).size
    assert(qCount == 5, s"expected 5 worst-query entries, got $qCount")
  }

  test("calibration probe lands on the line and sidecar when provided") {
    // round-13 contract: two rounds of boot-confounded totals — the
    // pinned synthetic probe's time must travel WITH the totals it
    // normalizes, in both the driver-facing line and the archive
    val line = Bench.renderLine(
      fakeResults, "/tmp/sf", "d.json", calib = Some(0.4321),
      calibIo = Some(0.1234))
    assert(line.contains("\"calib\":0.432"), s"line missing calib: ${line.take(200)}")
    assert(line.contains("\"calib_io\":0.123"), "line missing calib_io")
    assert(!line.contains("\n") && line.length < 2000)
    val detail = Bench.renderDetail(fakeResults, "/tmp/sf",
      Some(0.4321), Some(0.1234))
    assert(detail.contains("\"calib\":0.432"), "sidecar missing calib")
    assert(detail.contains("\"calib_io\":0.123"), "sidecar missing calib_io")
  }

  test("value_norm = value x (CalibRef / calib) travels with the line") {
    // round-14 contract: the probe existed since r13 but every grader
    // still normalized by hand — the line itself must carry the
    // calib-normalized total against the PINNED anchor
    val total = fakeResults.map(_.sec).sum
    val calib = 2.0 * Bench.CalibRef // a boot running at half speed
    val line = Bench.renderLine(
      fakeResults, "/tmp/sf", "d.json", calib = Some(calib))
    val expect = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(total / 2.0))
    assert(line.contains("\"value_norm\":" + expect),
      s"line missing value_norm=$expect: ${line.take(300)}")
    val detail = Bench.renderDetail(fakeResults, "/tmp/sf", Some(calib))
    assert(detail.contains("\"value_norm\":" + expect), "sidecar missing value_norm")
    // a dead probe must not manufacture a normalized number
    assert(Bench.normOf(10.0, Some(0.0)).isEmpty)
    assert(Bench.normOf(10.0, None).isEmpty)
    assert(!Bench.renderLine(fakeResults, "/tmp/sf", "d.json")
      .contains("value_norm"))
  }

  test("a spike-suspect calib omits value_norm and flags itself instead") {
    // r15 contract: a transient load spike during the pre-suite probe
    // once inflated value_norm 2.2x. When the post-suite cross-check
    // disproves the pre sample, the line must NOT carry a normalized
    // number at all — calib stays (it is the raw observation), the
    // calib_suspect flag explains the absence, and the sidecar carries
    // the (calib, calib_post) pair for forensics.
    val line = Bench.renderLine(fakeResults, "/tmp/sf", "d.json",
      calib = Some(0.402), calibSuspect = true, dropNorm = true)
    assert(line.contains("\"calib\":0.402"))
    assert(line.contains("\"calib_suspect\":true"), line.take(300))
    assert(!line.contains("value_norm"), "suspect run must not publish value_norm")
    val detail = Bench.renderDetail(fakeResults, "/tmp/sf",
      Some(0.402), Some(0.25), calibPost = Some(0.112), calibSuspect = true,
      dropNorm = true)
    assert(detail.contains("\"calib_post\":0.112"), "sidecar missing calib_post")
    assert(detail.contains("\"calib_suspect\":true") && !detail.contains("value_norm"))
  }

  test("a loaded-box calib flags calib_suspect but KEEPS value_norm") {
    // r16 contract (the r15 driver artifact's case: calib 0.269 at
    // CalibRef 0.180 — a genuinely loaded box, where value_norm is
    // exactly the number to grade): the line self-identifies with
    // calib_suspect:true AND still publishes the normalized total;
    // only the spike class (pre sample disproved by post) drops it
    val total = fakeResults.map(_.sec).sum
    val line = Bench.renderLine(fakeResults, "/tmp/sf", "d.json",
      calib = Some(0.269), calibSuspect = true)
    assert(line.contains("\"calib_suspect\":true"), line.take(300))
    val expect = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(total * Bench.CalibRef / 0.269))
    assert(line.contains("\"value_norm\":" + expect),
      s"loaded-box line must keep value_norm=$expect: ${line.take(300)}")
  }

  test("calib classification: elevated pre needs post corroboration to keep value_norm") {
    // r16 ADVICE: the loaded class used to trigger on the pre sample
    // alone, so a transient spike landing pre in (0.27, 0.32]
    // published a value_norm computed from the disproved sample. The
    // (calibSuspect, dropNorm) contract now:
    // clean box — pre inside the band, warm post: no flag, norm kept
    assert(Bench.calibClass(0.183, 0.112) == (false, false))
    // genuinely loaded box — BOTH samples elevated: flag, norm KEPT
    // (the normalization is the rescue)
    assert(Bench.calibClass(0.290, 0.170) == (true, false))
    // classic spike — pre far outside the band, post at the warm
    // floor: flag, norm OMITTED
    assert(Bench.calibClass(0.402, 0.112) == (true, true))
    // the ADVICE boundary — pre in (0.27, 0.32], post at the warm
    // floor: the post sample disproved the pre; norm must be OMITTED
    assert(Bench.calibClass(0.300, 0.112) == (true, true),
      "an uncorroborated moderate elevation must not publish value_norm")
    // boundary exactness: pre at exactly 1.5× CalibRef is not elevated
    assert(Bench.calibClass(1.5 * Bench.CalibRef, 0.112) == (false, false))
    // post exactly at the warm floor corroborates
    assert(Bench.calibClass(0.300, Bench.WarmFloor) == (true, false))
  }

  test("round-stamped sidecar is written only for the graded run shape") {
    // r16 contract: every /tmp/sf1 and SPARK_GRAFT_ONLY run used to
    // clobber the committed sf0.1 per-query archive (it hit r15's
    // working tree); only the graded shape stamps, env overrides both
    // ways
    assert(Bench.shouldStampRound(Bench.GradedSfDir, fullCatalog = true, None))
    assert(!Bench.shouldStampRound("/tmp/sf1", fullCatalog = true, None),
      "a 10× run must not stamp the round archive")
    assert(!Bench.shouldStampRound(Bench.GradedSfDir, fullCatalog = false, None),
      "a filtered dev-loop run must not stamp the round archive")
    assert(Bench.shouldStampRound("/tmp/sf1", fullCatalog = false, Some("1")),
      "SPARK_GRAFT_ROUND_STAMP=1 must force stamping")
    assert(!Bench.shouldStampRound(Bench.GradedSfDir, fullCatalog = true, Some("0")),
      "SPARK_GRAFT_ROUND_STAMP=0 must suppress stamping")
  }

  test("detail sidecar carries every query") {
    val detail = Bench.renderDetail(fakeResults, "/root/testdata/sf0.1")
    for (k <- SparkEntry.queries.keys)
      assert(detail.contains("\"" + k + "\":"), s"detail missing $k")
  }

  test("exit code contract: all-green run exits 0, any failure exits 1") {
    // round 8 shipped 41 silent failures because the only signal was
    // a JSON field nothing read; the process exit code is the
    // contract the driver's rc actually captures (round 10), pinned
    // here as a function of the graded outcomes
    assert(Bench.exitCode(fakeResults) == 0)
    val oneFail = fakeResults.head.copy(
      err = Some("IllegalStateException: planted")) +: fakeResults.tail
    assert(Bench.exitCode(oneFail) == 1)
    // round 12: a run that graded NOTHING (empty catalog, filter
    // matched no query) must not exit green — same silent-failure
    // class, distinct code so the driver can tell it from a query err
    assert(Bench.exitCode(Seq.empty) == 2)
    // the summary line still renders on a failing run — main prints
    // it BEFORE exiting nonzero, so the driver always gets the line
    val line = Bench.renderLine(oneFail, "/root/testdata/sf0.1", "d.json")
    assert(line.contains("\"failed\":1"), line.take(200))
  }

  test("round-stamped sidecar name is inferred from the BENCH archives") {
    // the judge's round-11 gap: bench_detail.json is transient, so no
    // per-query diff was possible between rounds. The stamped copy
    // lands next to BENCH_r{NN}.json as round max+1 — the bench that
    // writes it is the one whose summary becomes that round's grade.
    val d = java.nio.file.Files.createTempDirectory("graft_bench_rounds")
    assert(Bench.roundStampedDetailFile(d.toString).isEmpty,
      "no archives → no round to stamp")
    java.nio.file.Files.write(d.resolve("BENCH_r01.json"), "{}".getBytes)
    java.nio.file.Files.write(d.resolve("BENCH_r11.json"), "{}".getBytes)
    val f = Bench.roundStampedDetailFile(d.toString)
    assert(f.exists(_.endsWith("bench_detail_r12.json")),
      s"expected r12 stamp (max archive 11 + 1), got $f")
  }

  test("a throwing query grades as err, not as a fast success") {
    // the exact hole the round-6 audit flagged: Bench used to swallow
    // all Throwables, so a broken query looked like a 0.01 s pass
    val (sec, err) = Bench.timed(() =>
      throw new IllegalStateException("planted failure: table missing"))
    assert(err.isDefined, "a Throwable must surface as err")
    assert(err.get.contains("IllegalStateException") &&
      err.get.contains("planted failure"), s"err lost the cause: $err")
    val results = fakeResults.take(3) :+
      Bench.Outcome("q_broken", sec, err)
    val line = Bench.renderLine(results, "/tmp/sf", "d.json")
    assert(line.contains("\"failed\":1"), s"failure count missing: $line")
    val detail = Bench.renderDetail(results, "/tmp/sf")
    assert(detail.contains("\"q_broken\":\"IllegalStateException"),
      s"sidecar must carry the error message: $detail")
  }

  test("error messages with quotes/newlines cannot break the JSON line") {
    val (_, err) = Bench.timed(() =>
      throw new RuntimeException("quote \" backslash \\ and\nnewline"))
    val results = Seq(Bench.Outcome("q_bad", 0.1, err))
    val detail = Bench.renderDetail(results, "/tmp/sf")
    assert(!detail.contains("\n"), "sidecar JSON must stay one line")
    val line = Bench.renderLine(results, "/tmp/sf", "d.json")
    assert(!line.contains("\n") && line.endsWith("}"))
  }

  test("settle pass grades min(first, rerun) and keeps the first pass visible") {
    val settled = Bench.Outcome("q_heavy", 1.73, firstPass = Some(10.5))
    val detail = Bench.renderDetail(Seq(settled), "/tmp/sf")
    assert(detail.contains("\"queries\":{\"q_heavy\":1.730}"))
    assert(detail.contains("\"first_pass\":{\"q_heavy\":10.500}"),
      s"pre-settle observation must stay auditable: $detail")
  }

  test("summary line reports BOTH totals: settled and first-pass") {
    // round-7 advice: the graded total is a best-of-two for the
    // worst-K only — print the single-run total next to it so the
    // settle delta is visible on the line itself, not just in the
    // sidecar
    val results = Seq(
      Bench.Outcome("q_heavy", 1.73, firstPass = Some(10.5)),
      Bench.Outcome("q_quick", 0.27))
    val line = Bench.renderLine(results, "/tmp/sf", "d.json")
    assert(line.contains("\"value\":2.000"), s"settled total wrong: $line")
    assert(line.contains("\"first_pass_total\":10.770"),
      s"single-run total must be on the line: $line")
  }
}
