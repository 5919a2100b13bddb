package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's baseline loader: per-query minimum
  * across every archived round. Pointed at fixture dirs so the
  * sort/min/missing-file behavior is testable without running a bench.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private def fixture(files: (String, String)*): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_fix").toFile
    files.foreach { case (name, body) =>
      val w = new java.io.PrintWriter(new java.io.File(dir, name))
      try w.write(body) finally w.close()
    }
    dir
  }

  private def round(qs: (String, Double)*): String = {
    val m = qs.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"n":1,"parsed":{"queries":{$m}}}"""
  }

  test("baseline is the per-query min across ALL archived rounds") {
    val dir = fixture(
      "BENCH_r04.json" -> round("a" -> 1.0, "b" -> 9.0),
      "BENCH_r05.json" -> round("a" -> 3.0, "b" -> 2.0, "c" -> 4.0),
      "BENCH_r06.json" -> round("a" -> 2.0, "b" -> 21.0))
    val base = Bench.regressionBaseline(dir)
    assert(base === Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0))
  }

  test("unpadded round numbers sort numerically, not lexicographically") {
    // r9 vs r10: lexicographic filename order would put r9 last and
    // (under the old newest-round rule) make it a permanently stale
    // baseline; the min rule plus numeric extraction is immune
    val dir = fixture(
      "BENCH_r9.json" -> round("a" -> 5.0),
      "BENCH_r10.json" -> round("a" -> 1.5))
    assert(Bench.regressionBaseline(dir) === Map("a" -> 1.5))
  }

  test("baseline lookback window drops rounds older than the newest 4") {
    // r01 holds the all-time min for "a" but falls outside the window:
    // an accepted slowdown self-heals once its pre-change rounds age
    // out, instead of being flagged REGRESSION forever
    val dir = fixture(
      "BENCH_r01.json" -> round("a" -> 0.1),
      "BENCH_r02.json" -> round("a" -> 5.0),
      "BENCH_r03.json" -> round("a" -> 4.0),
      "BENCH_r04.json" -> round("a" -> 6.0),
      "BENCH_r05.json" -> round("a" -> 7.0))
    assert(Bench.regressionBaseline(dir) === Map("a" -> 4.0))
  }

  test("one unreadable round is skipped, not fatal to the baseline") {
    val dir = fixture(
      "BENCH_r04.json" -> round("a" -> 2.0),
      "BENCH_r05.json" -> "{truncated-mid-write",
      "BENCH_r06.json" -> round("a" -> 3.0))
    assert(Bench.regressionBaseline(dir) === Map("a" -> 2.0))
  }

  test("regression gate needs BOTH 1.5x relative and 0.3s absolute") {
    assert(Bench.overGate(now = 1.0, was = 0.5))
    // relative trip, absolute floor holds it back (0.1s-scale noise)
    assert(!Bench.overGate(now = 0.25, was = 0.1))
    // absolute delta large, relative under 1.5x (slow query drift)
    assert(!Bench.overGate(now = 10.4, was = 10.0))
    assert(!Bench.overGate(now = 0.5, was = 0.5))
  }

  test("non-bench files are ignored; empty dir yields empty baseline") {
    val dir = fixture(
      "BENCH_rX.json" -> "not json",
      "CORRECTNESS_r06.json" -> "{}")
    assert(Bench.regressionBaseline(dir) === Map.empty[String, Double])
    assert(Bench.regressionBaseline(
      java.nio.file.Files.createTempDirectory("graft_bench_empty").toFile)
      === Map.empty[String, Double])
  }
}
