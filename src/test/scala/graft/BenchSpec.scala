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
      "a" -> Bench.Timing(1.25, failed = false),
      "b" -> Bench.Timing(-1.0, failed = true),
      "c" -> Bench.Timing(2.0, failed = false))
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

  test("number rendering is locale-independent") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.num(0.123) == "0.123")
      assert(Bench.num(1234.5) == "1234.500")
    } finally java.util.Locale.setDefault(saved)
  }
}
