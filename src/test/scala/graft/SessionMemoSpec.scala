package graft

/** The session-keyed memo's concurrency contract: build-once per
  * (session, key), slow builds never block OTHER keys, and re-entrant
  * use of the memo for a different key inside a compute is legal
  * (the ConcurrentHashMap-computeIfAbsent version threw
  * IllegalStateException there — computes now run in per-key cells,
  * outside the map's bin locks). */
class SessionMemoSpec extends SparkSpec {

  test("build-once: concurrent same-key callers compute exactly once") {
    val memo = new SessionMemo[String]
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fs = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          gate.await()
          memo.getOrElseUpdate(spark, "k", {
            builds.incrementAndGet(); Thread.sleep(50); "built"
          })
        }
      })
    }
    gate.countDown()
    assert(fs.map(_.get()).toSet == Set("built"))
    pool.shutdown()
    assert(builds.get() == 1, s"computed ${builds.get()} times")
  }

  test("a slow build on one key does not block a different key") {
    val memo = new SessionMemo[String]
    val slowStarted = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val slow = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = memo.getOrElseUpdate(spark, "slow-key", {
        slowStarted.countDown(); release.await(); "slow"
      })
    })
    slowStarted.await()
    // while slow-key's compute is parked, an unrelated key must
    // complete immediately (the old map-lock version could park it
    // behind the same hash bin)
    val fast = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String =
        memo.getOrElseUpdate(spark, "fast-key", "fast")
    })
    assert(fast.get(5, java.util.concurrent.TimeUnit.SECONDS) == "fast")
    release.countDown()
    assert(slow.get() == "slow")
    pool.shutdown()
  }

  test("a compute may re-enter the memo for a DIFFERENT key") {
    val memo = new SessionMemo[Int]
    val got = memo.getOrElseUpdate(spark, "outer",
      memo.getOrElseUpdate(spark, "inner", 20) + 1)
    assert(got == 21)
    assert(memo.getOrElseUpdate(spark, "inner", -1) == 20)
  }

  test("a compute that re-enters the SAME key fails fast " +
      "(IllegalStateException, not unbounded recursion), and the key " +
      "stays computable afterwards") {
    val memo = new SessionMemo[Int]
    intercept[IllegalStateException] {
      memo.getOrElseUpdate(spark, "self",
        memo.getOrElseUpdate(spark, "self", 1) + 1)
    }
    // the failed compute must not poison the cell
    assert(memo.getOrElseUpdate(spark, "self", 42) == 42)
  }
}
