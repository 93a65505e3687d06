package pkel.text

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The per-task bounded memo must be a transparent wrapper: same results as
  * the raw kernel, one underlying call per distinct input under the cap, and
  * graceful degradation (not an error, not unbounded memory) past the cap.
  */
class MemoSpec extends AnyFunSuite {

  test("memoized function returns exactly the raw kernel's results") {
    val raw = (s: String) => PkTokenizer.blockingKey(Option(s).getOrElse(""))
    val memod = Memo(raw)
    val inputs = Seq("clearance", "AUC (0-24)", "", "half-life", "clearance",
      "Cmax/Dose", "clearance", "AUC (0-24)")
    assert(inputs.map(memod) == inputs.map(raw))
  }

  test("underlying kernel runs once per distinct input under the cap") {
    val calls = new AtomicInteger(0)
    val memod = Memo((s: String) => { calls.incrementAndGet(); s.length })
    val inputs = Seq.tabulate(1000)(i => s"surface-${i % 7}")
    inputs.foreach(memod)
    assert(calls.get == 7)
  }

  test("past the cap: results stay correct, map stays bounded, no eviction churn") {
    val calls = new AtomicInteger(0)
    val cap = 16
    val memod = new Memo((s: String) => { calls.incrementAndGet(); s.reverse }, cap)
    // 3 passes over 64 distinct inputs: first `cap` entries memoize, the
    // rest re-run every pass (bounded degradation, never wrong).
    val inputs = Seq.tabulate(64)(i => s"unique-$i")
    (1 to 3).foreach(_ => inputs.foreach(s => assert(memod(s) == s.reverse)))
    assert(calls.get == cap + 3 * (64 - cap))
  }

  test("null kernel results are passed through unmemoized") {
    val calls = new AtomicInteger(0)
    val memod = Memo((s: String) => { calls.incrementAndGet(); null: String })
    assert(memod("x") == null && memod("x") == null)
    assert(calls.get == 2)
  }
}
