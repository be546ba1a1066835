package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness itself: failure visibility + locale-independent
  * JSON. No SparkSession needed — measure/renderJson are pure. */
class BenchSpec extends AnyFunSuite {

  test("a failing query is marked failed and never reports a timing") {
    val results = Bench.measure(
      Seq(
        "good" -> (() => ()),
        "bad" -> (() => throw new RuntimeException("boom"))),
      runs = 2, reset = () => ())
    assert(!results("good").failed)
    assert(results("good").secs >= 0.0)
    assert(results("bad").failed)
    assert(results("bad").secs == -1.0)
  }

  test("an intermittent failure still marks the query failed") {
    var calls = 0
    val results = Bench.measure(
      Seq("flaky" -> (() => {
        calls += 1
        if (calls == 1) throw new RuntimeException("first run dies")
      })),
      runs = 2, reset = () => ())
    assert(results("flaky").failed)
    assert(results("flaky").secs == -1.0)
  }

  test("JSON carries the failed list and excludes failures from total") {
    val results = Map(
      "a" -> Bench.Timing(1.25, failed = false, spread = 1.1),
      "b" -> Bench.Timing(-1.0, failed = true, spread = 1.0),
      "c" -> Bench.Timing(2.0, failed = false, spread = 1.4))
    val json = Bench.renderJson(results, "sfX", None)
    assert(json.contains(""""failed":["b"]"""))
    assert(json.contains(""""value":3.250"""))
    assert(json.contains(""""b":-1.000"""))
    // a name filter restricts the per-query map but not total/failed
    val short = Bench.renderJson(results, "sfX", Some(Seq("a")))
    assert(short.contains(""""queries":{"a":1.250}"""))
    assert(short.contains(""""failed":["b"]"""))
    assert(short.contains(""""value":3.250"""))
  }

  test("JSON is regime-self-describing: cpus/shuffle/runs fields, " +
    "-1 when unknown") {
    val results = Map("a" -> Bench.Timing(1.0, failed = false, spread = 1.0))
    val json = Bench.renderJson(results, "sfX", None,
      regime = Bench.Regime(cpus = 32, shuffle = 128, runs = 2))
    // shuffle partitions alone swing per-query results up to ~5x
    // (SCALE.md round-11 sweep) — artifacts from different regimes must
    // be distinguishable without cross-referencing prose
    assert(json.contains(""""cpus":32"""))
    assert(json.contains(""""shuffle":128"""))
    assert(json.contains(""""runs":2"""))
    val unknown = Bench.renderJson(results, "sfX", None)
    assert(unknown.contains(""""cpus":-1"""))
  }

  test("noise_suspect flags queries whose run-to-run spread exceeds 3x") {
    val results = Map(
      "steady" -> Bench.Timing(1.0, failed = false, spread = 1.2),
      "noisy" -> Bench.Timing(0.3, failed = false, spread = 15.8),
      "dead" -> Bench.Timing(-1.0, failed = true, spread = 9.9))
    val json = Bench.renderJson(results, "sfX", None)
    // only the live noisy query is flagged; failures are not double-reported
    assert(json.contains(""""noise_suspect":["noisy"]"""))
    assert(json.contains(""""spread":{"""))
    assert(json.contains(""""noisy":15.800"""))
  }

  test("measure records max/min spread across runs") {
    var n = 0
    val results = Bench.measure(
      Seq("ramp" -> (() => {
        n += 1
        Thread.sleep(if (n == 1) 80L else 5L) // first run 'loaded host'
      })),
      runs = 3, reset = () => ())
    assert(!results("ramp").failed)
    assert(results("ramp").spread > 3.0) // 80ms vs ~5ms
    // min kept, not mean: the clean runs define the reported capability
    assert(results("ramp").secs < 0.05)
  }

  test("number rendering is locale-independent") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.num(0.123) == "0.123")
      assert(Bench.num(1234.5) == "1234.500")
    } finally java.util.Locale.setDefault(saved)
  }
}
