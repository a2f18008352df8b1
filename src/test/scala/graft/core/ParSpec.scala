package graft.core

import graft.SparkSpec

import java.util.concurrent.atomic.AtomicInteger

class ParSpec extends SparkSpec {

  test("runs every task and returns when all complete") {
    val n = new AtomicInteger
    Par.run(
      () => { n.incrementAndGet(); () },
      () => { n.incrementAndGet(); () },
      () => { n.incrementAndGet(); () }
    )
    assert(n.get == 3)
  }

  test("waits for ALL tasks; first failure rethrown, later ones suppressed") {
    val seen = new AtomicInteger
    val e = intercept[RuntimeException] {
      Par.run(
        () => { Thread.sleep(50); seen.incrementAndGet(); throw new RuntimeException("a") },
        () => { Thread.sleep(250); seen.incrementAndGet(); throw new IllegalStateException("b") },
        () => { Thread.sleep(120); seen.incrementAndGet(); () }
      )
    }
    assert(seen.get == 3, "a failing sibling must not short-circuit the others")
    assert(e.getMessage == "a")
    assert(e.getSuppressed.exists(_.getMessage == "b"),
      "the second concurrent failure must ride along as suppressed")
  }

  test("interrupting the caller cancels sibling jobs and drains before rethrow") {
    // The round-15 driver flake: a ScalaTest timeout interrupts the thread
    // blocked in f.get(), the old Par unwound leaving sibling Spark jobs
    // running, and one of them raced SparkContext teardown (task launch
    // rejected from the executor's shutting-down pool). The contract now:
    // no Spark action outlives Par.run on ANY exit path.
    val sc = spark.sparkContext
    def slowJob(): Unit = {
      import spark.implicits._
      spark.range(0, 400, 1, 4)
        .mapPartitions { it => it.map { i => Thread.sleep(20); i } }
        .write.format("noop").mode("overwrite").save()
    }
    @volatile var thrown: Throwable = null
    val runner = new Thread(() => {
      try Par.run(() => slowJob(), () => slowJob())
      catch { case t: Throwable => thrown = t }
    })
    runner.start()
    val startDeadline = System.currentTimeMillis() + 60000
    while (sc.statusTracker.getActiveJobIds().length < 2
        && System.currentTimeMillis() < startDeadline) Thread.sleep(50)
    assert(sc.statusTracker.getActiveJobIds().length >= 2, "both jobs must be in flight")
    Thread.sleep(200)
    runner.interrupt()
    runner.join(120000)
    assert(!runner.isAlive, "Par.run must return after an interrupt, not hang")
    assert(thrown.isInstanceOf[InterruptedException],
      s"interrupt must propagate (got $thrown)")
    val deadline = System.currentTimeMillis() + 30000
    while (sc.statusTracker.getActiveJobIds().nonEmpty
        && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(sc.statusTracker.getActiveJobIds().isEmpty,
      "no orphan Spark job may outlive Par.run")
  }
}
