package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Direct contract tests for BroadcastAsOfJoinExec's per-executor index
  * cache (the execution-path behavior is covered by every broadcast
  * as-of spec; this pins the cache semantics themselves).
  */
class IndexCacheSpec extends AnyFunSuite {

  test("one build per key, however many concurrent callers") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val key = s"spec-key-${System.nanoTime()}"
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val v = BroadcastAsOfJoinExec.cachedIndex(key) {
          builds.incrementAndGet()
          Thread.sleep(20) // widen the race window
          "built"
        }
        assert(v == "built")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get() == 1, s"expected one build, got ${builds.get()}")
  }

  test("distinct keys build independently and LRU keeps the cache bounded") {
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val tag = System.nanoTime()
    def get(i: Int): AnyRef = BroadcastAsOfJoinExec.cachedIndex(s"k$tag-$i") {
      builds.incrementAndGet(); Integer.valueOf(i)
    }
    (1 to 12).foreach(get) // 12 distinct keys through a bound of 8
    assert(builds.get() == 12)
    // key 12 is hot (most recent): a re-get must NOT rebuild
    get(12)
    assert(builds.get() == 12)
    // key 1 was evicted by LRU: a re-get rebuilds
    get(1)
    assert(builds.get() == 13)
  }
}
