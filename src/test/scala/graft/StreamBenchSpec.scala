package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the StreamBench record helpers — specifically the
  * failure-description builder: a sweep-point record that says a point
  * failed must carry the ROOT cause, not just the top wrapper (the r12
  * capped-heap sweep produced a StreamingQueryException whose 200-char
  * top message truncated exactly before the executor OutOfMemoryError
  * three causes down).
  */
class StreamBenchSpec extends AnyFunSuite {

  test("whyOf surfaces the root of a nested cause chain") {
    val root = new OutOfMemoryError("Java heap space")
    val mid  = new RuntimeException("Job aborted due to stage failure", root)
    val top  = new RuntimeException("Query terminated with exception", mid)
    val why = StreamBench.whyOf(top)
    assert(why.startsWith("RuntimeException: Query terminated with exception"))
    assert(why.contains("root: OutOfMemoryError: Java heap space"))
  }

  test("whyOf on a causeless exception has no root segment") {
    val why = StreamBench.whyOf(new IllegalStateException("boom"))
    assert(why == "IllegalStateException: boom")
  }

  test("whyOf is JSON-safe and bounded") {
    val nasty = new RuntimeException("line1\nline2\t\"quoted\\path\"",
      new RuntimeException("x" * 2000))
    val why = StreamBench.whyOf(nasty)
    assert(!why.exists(c => c < ' ' || c == '"' || c == '\\'))
    assert(why.length <= 500)
  }

  test("whyOf tolerates null messages and deep chains") {
    val deep = (1 to 20).foldLeft[Throwable](new RuntimeException(null: String)) {
      (cause, i) => new RuntimeException(s"level$i", cause)
    }
    val why = StreamBench.whyOf(deep)
    assert(why.startsWith("RuntimeException: level20"))
    assert(why.contains("root:"))
  }
}
