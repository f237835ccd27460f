package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-21 anti-contamination re-measure (VERDICT r20 #1): two
  * consecutive driver records (r19 1.16×, r20 2.3×) landed in degraded
  * windows that the trust block flagged but nothing mitigated. The retry
  * pass re-measures pin-elevated queries, worst first, keeps the min, and
  * is bounded in passes and wall clock.
  *
  * The contention model: a "window" during which every measurement of an
  * affected query reads k× its true cost — exactly the r9/r12/r20 shapes
  * (one or a family of queries blown 3–35× while the code is unchanged).
  * The simulated `force` serves contaminated values while the window is
  * open and true costs after it closes, so the spec asserts end to end
  * that a capture whose main pass was hit lands back within 1.5× of pins
  * with the retries flagged — the VERDICT's done-condition.
  */
class BenchRetrySpec extends AnyFunSuite {

  private val pins = Map("a" -> 0.10, "b" -> 0.50, "c" -> 1.00, "d" -> 0.20)

  test("a contention window over the main pass is healed: final capture " +
      "within 1.5x pins, retried queries flagged via extra run counts") {
    // main pass measured b at 7x and c at 3x (the window); a and d clean.
    val initial = Seq("a" -> 0.11, "b" -> 3.50, "c" -> 3.00, "d" -> 0.21)
    // window closed before the retry phase: retries read true cost + noise
    val clean = Map("a" -> 0.10, "b" -> 0.52, "c" -> 1.05, "d" -> 0.20)
    val served = scala.collection.mutable.ArrayBuffer[String]()
    val (fin, extra) = Bench.retryPass(initial, "sf0.1",
      n => { served += n; clean(n) }, pins)
    val byName = fin.toMap
    assert(byName("b") == 0.52 && byName("c") == 1.05,
      s"retried queries must report the min of everything observed: $byName")
    assert(byName("a") == 0.11 && byName("d") == 0.21,
      "clean queries are never re-measured")
    // worst-elevation-first: b at 7x is served before c at 3x
    assert(served.take(2) == Seq("b", "c"),
      s"retry order must be worst first so the budget goes to the worst " +
        s"offenders: $served")
    assert(extra == Map("b" -> 1, "c" -> 1),
      s"one extra run each (both healed on the first retry): $extra")
    // the VERDICT done-condition: the capture lands within 1.5x pins
    val ratio = fin.map(_._2).sum / fin.map(t => pins(t._1)).sum
    assert(ratio < 1.5, s"post-retry capture still reads ${ratio}x pins")
  }

  test("a GENUINE regression is not hidden: persistent cost survives " +
      "MaxRetryPasses and stays on the record") {
    val initial = Seq("a" -> 0.11, "b" -> 3.50)
    var calls = 0
    val (fin, extra) = Bench.retryPass(initial, "sf0.1",
      _ => { calls += 1; 3.45 }, pins) // the 7x cost reproduces every time
    assert(fin.toMap.apply("b") == 3.45,
      "min of honest measurements — a reproducing cost cannot be retried away")
    assert(calls == Bench.MaxRetryPasses && extra == Map("b" -> 2),
      s"bounded: exactly MaxRetryPasses extra runs, got $calls / $extra")
  }

  test("the wall-clock budget caps the retry phase even when many queries " +
      "stay elevated (the steady-contention session)") {
    val manyPins = (1 to 50).map(i => s"q$i" -> 0.1).toMap
    val initial = (1 to 50).map(i => s"q$i" -> 0.5)
    var now = 0L
    val (_, extra) = Bench.retryPass(initial, "sf0.1",
      _ => { now += 1000000000L; 0.5 }, // each forced run = 1 simulated sec
      manyPins, budgetSec = 10.0, clock = () => now)
    assert(extra.values.sum <= 11,
      s"10s budget at 1s/run must stop after ~10 runs: ${extra.values.sum}")
  }

  test("off sf0.1 and for unpinned or failed queries nothing is retried") {
    assert(Bench.retryTargets(Seq("a" -> 9.9), "sf0.01", pins).isEmpty)
    assert(Bench.retryTargets(Seq("zz" -> 9.9), "sf0.1", pins).isEmpty)
    assert(Bench.retryTargets(Seq("a" -> -1.0), "sf0.1", pins).isEmpty)
    val (fin, extra) = Bench.retryPass(Seq("a" -> 9.9), "sf0.01",
      _ => fail("must not measure off sf0.1"), pins)
    assert(fin == Seq("a" -> 9.9) && extra.isEmpty)
  }

  test("a retry that fails (-1) or reads slower never replaces the " +
      "existing measurement") {
    val vals = Iterator(-1.0, 9.0)
    val (fin, extra) = Bench.retryPass(Seq("b" -> 3.5), "sf0.1",
      _ => vals.next(), pins)
    assert(fin == Seq("b" -> 3.5) && extra == Map("b" -> 2))
  }

  test("the retried count rides the trust fields and stays within the " +
      "trust line budget") {
    val line = Bench.trustLine("sf0.1", contaminated = Some(false),
      canaryX = Some(1.02), canaryMax = Some(1.1), cpuRef = Some(0.045),
      mtX = Some(1.2), retried = Some(12)).get
    assert(line.contains(""""retried":12"""))
    assert(line.length + 1 <= Bench.TrustLineReserve,
      s"trust line ${line.length} B with the retried field must stay bounded")
    assert(!line.contains("\"metric\""), "trust stays de-shaped")
  }
}
