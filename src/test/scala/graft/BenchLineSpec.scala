package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench output contract: the grading harness captures only
  * a bounded stdout tail (~2.9 KB) and parses the LAST JSON line, so
  * the printed summary must stay well under that no matter how many
  * queries the catalog grows to. Rounds 2 and 3 both shipped a line
  * that silently outgrew the window because nothing asserted the
  * bound — this spec is that assertion.
  */
class BenchLineSpec extends AnyFunSuite {

  private def fakeResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(k => k -> 123.456789)

  test("summary line stays under 2.0 KB at the current catalog size") {
    val line = Bench.renderLine(
      fakeResults, "/root/testdata/sf0.1", "bench_detail.json")
    assert(line.length < 2000,
      s"bench summary line is ${line.length} bytes; driver tail is ~2.9 KB")
    // the bound must hold structurally, not by luck: the line carries
    // a fixed number of per-query entries regardless of catalog size
    val grown = Bench.renderLine(
      fakeResults ++ (1 to 200).map(i => f"q_future_$i%03d_extra" -> 1.0),
      "/root/testdata/sf0.1", "bench_detail.json")
    assert(grown.length < 2000, "line size must not grow with the catalog")
  }

  test("summary line is valid single-line JSON with required fields") {
    val line = Bench.renderLine(
      fakeResults, "/root/testdata/sf0.1", "bench_detail.json")
    assert(!line.contains("\n"))
    assert(line.startsWith("{") && line.endsWith("}"))
    for (key <- Seq("\"metric\":", "\"value\":", "\"unit\":", "\"n\":",
                    "\"queries\":", "\"sf\":"))
      assert(line.contains(key), s"missing $key")
    // queries carries exactly the 5 worst entries
    val qCount = "\"q\\d[^\"]*\":".r.findAllIn(
      line.substring(line.indexOf("\"queries\":"))).size
    assert(qCount == 5, s"expected 5 worst-query entries, got $qCount")
  }

  test("detail sidecar carries every query") {
    val detail = Bench.renderDetail(fakeResults, "/root/testdata/sf0.1")
    for (k <- SparkEntry.queries.keys)
      assert(detail.contains("\"" + k + "\":"), s"detail missing $k")
  }
}
