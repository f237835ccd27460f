package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract on Bench's stdout: the metric line is printed
  * last and must stay under the driver's tail-capture window, or the round
  * records no bench total (this bit r2 and r7 — see VERDICT r7 item 1).
  */
class BenchEmitSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("metric line for the full query suite stays under the capture " +
      "budget AND keeps its 3-decimal per-query map") {
    // Realistic magnitudes (every sf0.1 query runs single-digit seconds):
    // the line must fit WITHOUT dropping the per-query map — the driver
    // reads per-query timings from this line
    val timings = names.map(_ -> 9.999)
    val line = Bench.metricLine(timings, "sf0.1")
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin,
      s"metric line is ${line.length} bytes for ${names.size} queries")
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.endsWith(""""sf":"sf0.1"}"""))
    assert(line.contains("\"" + names.head + "\":9.999"),
      "per-query map was dropped or degraded for realistic magnitudes")
    assert(!line.contains("\"runs\""), "runs belongs on the detail line only")
  }

  test("absurdly slow suites drop the per-query map rather than exceed " +
      "the budget") {
    val timings = names.map(_ -> 999999.999)
    val line = Bench.metricLine(timings, "sf0.1")
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin)
    assert(line.contains("\"metric\":\"total\",\"value\":"))
  }

  test("metric line never exceeds the budget even with absurd suite growth") {
    val many = (1 to 500).map(i => f"q${i}%03d_very_long_query_name_padding" -> 12345.678)
    val line = Bench.metricLine(many, "sf0.1")
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin)
    // Degraded line still carries the headline total.
    assert(line.contains("\"metric\":\"total\",\"value\":"))
  }

  test("failed queries are excluded from the total but reported as -1") {
    val timings = Seq("a" -> 1.0, "b" -> -1.0, "c" -> 2.5)
    val line = Bench.metricLine(timings, "sfX")
    assert(line.contains("\"value\":3.500"))
    assert(line.contains("\"b\":-1"))
  }

  test("detail line carries full-precision timings and run counts") {
    val line = Bench.detailLine(Seq("a" -> 1.2345), Seq("a" -> 3), "sfX")
    assert(line.contains("\"a\":1.235") && line.contains("\"runs\":{\"a\":3}"))
  }
}
