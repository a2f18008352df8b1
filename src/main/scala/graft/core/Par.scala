package graft.core

/** Run independent driver-side actions CONCURRENTLY so one job's task
  * tail back-fills with the next job's tasks instead of leaving the
  * cluster idle (the guide's overlap-independent-jobs discipline: Spark's
  * scheduler happily runs several jobs at once; actions are sequential
  * only because driver code calls them sequentially).
  *
  * Intended for maintenance loops that commit several INDEPENDENT sinks
  * per batch (labels / postings / forest, vector / index / meta): each
  * merge is a small job that uses a fraction of the cores, and running
  * them back to back serializes their fixed overheads. The sinks'
  * per-path locks make concurrent merges to DIFFERENT paths safe; callers
  * must not pass two tasks that touch the SAME sink.
  *
  * Failure semantics: waits for all tasks, then rethrows the first
  * failure (unwrapped), with any later failures attached as suppressed —
  * a failing merge still fails the batch exactly as it would
  * sequentially, and a second concurrent failure is not lost.
  *
  * Interrupt safety: if the CALLING thread is interrupted while waiting
  * (a test-framework timeout, a shutdown hook), the remaining tasks are
  * cancelled, their in-flight Spark jobs are cancelled via a job tag,
  * and the pool is drained before the interrupt propagates. No Spark
  * action may outlive Par.run on any exit path: an orphan job left
  * running races SparkContext teardown (task launch rejected from the
  * executor's shutting-down thread pool) and fails the whole session.
  */
object Par {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    // Optional on purpose: tasks that never touch Spark still run fine
    // when no session exists; with a session, every worker's jobs get a
    // cancellable tag.
    val scOpt = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext)
    val tag = "graft-par-" + java.lang.Long.toHexString(System.nanoTime())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    val futures = tasks.map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          // Tag this worker thread's jobs so an interrupted caller can
          // cancel them as a group (thread-local, inherited props intact).
          scOpt.foreach(_.addJobTag(tag))
          t()
        }
      })
    }
    pool.shutdown() // no further submissions; workers keep running
    var firstFailure: Throwable = null
    var interrupted: InterruptedException = null
    futures.foreach { f =>
      if (interrupted == null) {
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            val cause = Option(e.getCause).getOrElse(e: Throwable)
            if (firstFailure == null) firstFailure = cause
            else if (firstFailure ne cause) firstFailure.addSuppressed(cause)
          case e: InterruptedException =>
            interrupted = e
        }
      }
    }
    if (interrupted != null) {
      // Stop the siblings rather than letting their jobs race teardown.
      futures.foreach(_.cancel(true))
      try scOpt.foreach(_.cancelJobsWithTag(tag))
      catch { case scala.util.control.NonFatal(_) => () }
      pool.shutdownNow()
    }
    drain(pool)
    if (interrupted != null) {
      Thread.currentThread().interrupt()
      throw interrupted
    }
    if (firstFailure != null) throw firstFailure
  }

  /** Block (bounded) until every worker thread has exited. On the happy
    * path this returns immediately (all futures completed). On the
    * interrupt path the jobs were just cancelled, so the actions unblock
    * promptly; the bound only guards against a task stuck in non-Spark
    * code that ignores interrupts — its jobs are already cancelled, so
    * proceeding past it cannot leave a live Spark action behind.
    */
  private def drain(pool: java.util.concurrent.ExecutorService): Unit = {
    val deadline = System.nanoTime() + java.util.concurrent.TimeUnit.MINUTES.toNanos(2)
    var done = false
    var reInterrupt = false
    while (!done && System.nanoTime() < deadline) {
      try done = pool.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: InterruptedException =>
          reInterrupt = true
          pool.shutdownNow()
      }
    }
    if (reInterrupt) Thread.currentThread().interrupt()
  }
}
