package graft.ops

/** Driver-side parallel execution of INDEPENDENT Spark actions (guide
  * §2.6 "overlap independent jobs"): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. The MV publish
  * closures write several independent layers (sigs/sizes/pairs/batchdocs/
  * bloom; cells/centroids; adj/vecs); running them from a small pool
  * makes the publish's wall time max(layer) instead of Σ(layer), and the
  * tail tasks of one write back-fill cores freed by another.
  *
  * Failure semantics match the sequential form: every thunk is awaited,
  * the FIRST failure is rethrown (after all complete or fail) — so a
  * publish aborts without its commit marker exactly as before, and no
  * write is left running past the call. Pool size is bounded by the
  * thunk count (≤ 6 at every call site); threads are daemons so a
  * crashed driver never hangs on exit.
  */
object Par {
  def all(thunks: (() => Unit)*): Unit = {
    if (thunks.size <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      thunks.size,
      (r: Runnable) => { val t = new Thread(r, "graft-par"); t.setDaemon(true); t })
    try {
      val futs = thunks.map(t => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
      var firstFailure: Option[Throwable] = None
      futs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally { pool.shutdownNow(); () }
  }
}
