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
  * failure (unwrapped), so a failing merge still fails the batch exactly
  * as it would sequentially.
  */
object Par {
  def run(tasks: (() => Unit)*): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      var firstFailure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty)
              firstFailure = Some(Option(e.getCause).getOrElse(e))
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }
}
