package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's driver contract. The driver captures only the
  * last ~2,000 characters of the bench's stdout and parses the FINAL line as
  * JSON; round 8's headline line embedded the per-repetition runs array
  * (~5 KB) and went unparseable. These tests build the headline with the
  * REAL pinned headline query set — so adding a query or a field that pushes
  * the line past the capture window fails here, not in the round artifact.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private def parse(s: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  private val headlineNames = SparkEntry.allDefs.map(_.name).filter(SparkEntry.headline).sorted

  // worst plausible realistic widths: two-digit seconds per query, a loaded
  // loadavg string, max-observed calibration, the full sf path
  private val line = Bench.headlineJson(
    total = 99.1234,
    best = headlineNames.map(_ -> 12.3456),
    sfDir = "/root/testdata/sf0.1",
    repeats = 3,
    calibrationMs = 1234.5678,
    loadavg = "32.12,31.98,30.55",
    batch212MsPerQuery = 123.4567,
    batch212ColdMsPerQuery = 456.7891)

  test("headline line stays under 1,500 chars (driver keeps a 2,000-char tail)") {
    assert(line.length < 1500, s"headline line is ${line.length} chars:\n$line")
    assert(headlineNames.nonEmpty)
  }

  test("headline line is one line of valid JSON with the driver's fields") {
    assert(!line.contains("\n"))
    val j = parse(line)
    assert(j.get("metric").asText() == "total")
    assert(math.abs(j.get("value").asDouble() - 99.1234) < 1e-9)
    assert(j.get("unit").asText() == "sec")
    assert(j.get("queries").size() == headlineNames.size)
    assert(j.get("repeats").asInt() == 3)
    assert(j.get("calibration_ms").asDouble() > 0)
    assert(j.get("loadavg").asText().nonEmpty)
    assert(j.get("batch212_ms_per_query").asDouble() > 0)
    // the steady/cold pair: steady keeps the legacy name (trend line), cold
    // carries the fresh-handle snapshot-build cost (r16 verdict item 2).
    // Since r18 (r17 ADVICE) the regime is ALSO named explicitly so trend
    // tooling can detect the r17 cold->steady cut-over of the legacy field:
    // batch212_steady_ms_per_query must alias the legacy value exactly, and
    // the semantics marker names the cut-over round.
    assert(j.get("batch212_steady_ms_per_query").asDouble()
      == j.get("batch212_ms_per_query").asDouble())
    assert(j.get("batch212_semantics").asText() == "steady_since_r17")
    assert(j.get("batch212_cold_ms_per_query").asDouble() > 0)
    // the -1 failure signal survives the fixed-point formatting
    val failed = parse(Bench.headlineJson(-1.0, Seq("q_x" -> -1.0), "d", 1, 1.0, "", -1.0, -1.0))
    assert(failed.get("queries").get("q_x").asDouble() == -1.0)
  }

  test("a throwing query records -1.0, not its elapsed time (round-9 defect)") {
    // the throw happens AFTER measurable wall-clock has elapsed — the old
    // code would have recorded that elapsed time as a (fast) success
    val t = Bench.timeQuery { () =>
      Thread.sleep(5); throw new RuntimeException("analysis exception stand-in")
    }
    assert(t == -1.0)
    assert(Bench.timeQuery(() => ()) >= 0.0)
  }

  test("failures are excluded from the headline total and listed in `failed`") {
    val best = Seq("q_ok" -> 2.5, "q_boom" -> -1.0, "q_ok2" -> 1.5)
    val total = Bench.headlineTotal(best)
    assert(total == 4.0) // a crash can never lower (or raise) the total
    val j = parse(Bench.headlineJson(total, best, "d", 1, 1.0, "", -1.0, -1.0))
    assert(j.get("failed").size() == 1)
    assert(j.get("failed").get(0).asText() == "q_boom")
    // a partial run's `value` is null, never a smaller total: a consumer
    // diffing `value` alone cannot read a crash as a speedup
    assert(j.get("value").isNull)
    // and the all-green shape carries an explicitly-empty list, so a
    // consumer can distinguish "no failures" from "field missing"
    val clean = parse(Bench.headlineJson(4.0, Seq("q_ok" -> 4.0), "d", 1, 1.0, "", -1.0, -1.0))
    assert(clean.get("failed").size() == 0)
    assert(math.abs(clean.get("value").asDouble() - 4.0) < 1e-9)
  }

  test("runs detail is valid JSON printed separately from the headline") {
    val detail = Bench.runsDetailJson(Seq(
      (241.5, "1.0,1.2,1.4", headlineNames.map(_ -> 0.123456789)),
      (274.0, "2.0,2.2,2.4", headlineNames.map(_ -> 0.234567891))))
    assert(!detail.contains("\n"))
    val j = parse(detail)
    assert(j.get("detail").asText() == "bench_runs")
    assert(j.get("runs").size() == 2)
    assert(j.get("runs").get(0).get("queries").size() == headlineNames.size)
  }
}
