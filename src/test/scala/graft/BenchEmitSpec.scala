package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract on Bench's stdout: the metric line is printed
  * last and must stay under the driver's tail-capture window, or the round
  * records no bench total (this bit r2 and r7 — see VERDICT r7 item 1).
  * Also pins the r9 contamination policy: median-of-3 everywhere plus a
  * scan-only canary flag, so a disturbed session can never be silently the
  * round's number of record again (r8's 43.4 s vs 27.4–30.6 s clean).
  */
class BenchEmitSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("metric line for the full query suite stays under the capture " +
      "budget AND keeps a per-query map at >=2 decimals") {
    // Realistic magnitudes (the sf0.1 suite is dominated by sub-second
    // queries): the line must fit WITHOUT dropping the per-query map —
    // the driver reads per-query timings from this line. 3 decimals is
    // preferred but the suite has grown past the point where 3 decimals
    // + the contamination flag are both guaranteed; 2 decimals is the
    // floor (the detail line always carries 3).
    val timings = names.map(_ -> 0.987)
    val line = Bench.metricLine(timings, "sf0.1", Some(false),
      Some(1.38), Some(0.152))
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin,
      s"metric line is ${line.length} bytes for ${names.size} queries")
    assert(line.startsWith("""{"metric":"total""""))
    assert(line.endsWith(""""sf":"sf0.1"}"""))
    assert(line.contains("\"" + names.head + "\":0.9"),
      "per-query map was dropped or degraded below 2 decimals")
    assert(line.contains("\"canary_x\":1.38") && line.contains("\"cpu_ref\":0.152"),
      "graded contamination context must ride the metric line")
    assert(!line.contains("\"runs\""), "runs belongs on the detail line only")
  }

  test("absurdly slow suites drop the per-query map rather than exceed " +
      "the budget") {
    val timings = names.map(_ -> 999999.999)
    val line = Bench.metricLine(timings, "sf0.1", Some(true))
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin)
    assert(line.contains("\"metric\":\"total\",\"value\":"))
  }

  test("metric line never exceeds the budget even with absurd suite growth") {
    val many = (1 to 500).map(i => f"q${i}%03d_very_long_query_name_padding" -> 12345.678)
    val line = Bench.metricLine(many, "sf0.1", Some(true))
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

  // --- contamination canary ---

  private def suiteWith(canaries: (String, Double)*): Seq[(String, Double)] = {
    val cs = canaries.toMap
    names.map(n => n -> cs.getOrElse(n, 0.5))
  }

  test("clean canary medians report contaminated=false on the metric line") {
    val timings = suiteWith(
      "q02_filter_project" -> 0.17, "q16_string_funcs" -> 0.10,
      "q30_date_funcs" -> 0.09)
    val flag = Bench.contaminationFlag(timings, "sf0.1")
    assert(flag.contains(false))
    val line = Bench.metricLine(timings, "sf0.1", flag)
    assert(line.contains("\"contaminated\":false"))
    assert(line.length <= Bench.TailCaptureBytes - Bench.SafetyMargin)
  }

  test("a session-wide 1.9x elevation (the r8 shape) flags contaminated=true") {
    val timings = suiteWith(
      "q02_filter_project" -> 0.163 * 1.9, "q16_string_funcs" -> 0.099 * 1.9,
      "q30_date_funcs" -> 0.087 * 1.9)
    val flag = Bench.contaminationFlag(timings, "sf0.1")
    assert(flag.contains(true))
    assert(Bench.metricLine(timings, "sf0.1", flag)
      .contains("\"contaminated\":true"))
  }

  test("one elevated canary alone does not flag (single-query noise is " +
      "median-of-3's job, not the canary's)") {
    val timings = suiteWith(
      "q02_filter_project" -> 0.163 * 3.0, "q16_string_funcs" -> 0.10,
      "q30_date_funcs" -> 0.09)
    assert(Bench.contaminationFlag(timings, "sf0.1").contains(false))
  }

  test("flag is not evaluated off sf0.1 or when canaries are absent/failed") {
    val timings = suiteWith(
      "q02_filter_project" -> 0.9, "q16_string_funcs" -> 0.9,
      "q30_date_funcs" -> 0.9)
    assert(Bench.contaminationFlag(timings, "sf0.01").isEmpty)
    val failed = timings.map { case (n, v) =>
      n -> (if (Bench.CanaryCleanSf01.contains(n)) -1.0 else v)
    }
    assert(Bench.contaminationFlag(failed, "sf0.1").isEmpty)
    // absent flag => no contaminated field at all (absence = "not
    // evaluated", never "clean")
    assert(!Bench.metricLine(timings, "sf0.01", None).contains("contaminated"))
  }

  test("contaminated flag survives per-query map degradation") {
    val many = (1 to 500).map(i => f"q${i}%03d_very_long_query_name_padding" -> 12345.678)
    val line = Bench.metricLine(many, "sf0.1", Some(true), Some(1.92), Some(0.31))
    assert(line.contains("\"contaminated\":true"),
      "the one trust bit must never be degraded away")
    assert(line.contains("\"canary_x\":1.92") && line.contains("\"cpu_ref\":0.310"),
      "the graded context must never be degraded away either")
  }

  test("canary_x is the graded elevation even when the boolean stays false " +
      "(the CPU-contention gray zone)") {
    // The shape observed this round: scan canaries ~1.4x (under the 1.75
    // flag threshold) while compute-bound queries ran ~2x — the ratio must
    // surface the elevation the boolean collapses to false.
    val timings = suiteWith(
      "q02_filter_project" -> 0.163 * 1.39, "q16_string_funcs" -> 0.099 * 1.32,
      "q30_date_funcs" -> 0.087 * 1.48)
    assert(Bench.contaminationFlag(timings, "sf0.1").contains(false))
    val x = Bench.canaryRatio(timings, "sf0.1").get
    assert(x > 1.3 && x < 1.5, s"median ratio $x")
    // not evaluated off sf0.1, same rule as the flag
    assert(Bench.canaryRatio(timings, "sf0.01").isEmpty)
  }

  test("cpu_ref is a positive sub-10s fixed workload") {
    val t = Bench.cpuRefSec()
    assert(t > 0.0 && t < 10.0, s"cpu_ref $t")
  }
}
