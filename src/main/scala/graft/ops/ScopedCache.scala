package graft.ops

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Cache with action-scoped lifetime: `untilConsumed(df)` caches `df` and
  * automatically unpersists it after the first action that consumed it
  * completes, so multi-consumer fragments (a self-join's shared side, a
  * relation feeding both a join and its size aggregate) get the
  * compute-once benefit WITHOUT leaving blocks pinned in the user's
  * session afterwards — the cache hygiene a long-lived notebook or
  * multi-tenant driver needs, where a leaked 100 GB cached relation
  * evicts everyone else's working set.
  *
  * Mechanics: the cached fragment's analyzed plan is remembered in
  * canonicalized form; a [[QueryExecutionListener]] watches completed
  * actions (success or failure — a failed consumer shouldn't leak
  * either) and, when one's plan contains the fragment as a subtree,
  * unpersists and unregisters. Consumption is lazy-safe: the cache lives
  * exactly as long as the returned query is unexecuted, then one action.
  * A second execution of the same query recomputes uncached — correct,
  * just unboosted — which fits the engine's query-per-action contract
  * (Verify writes each query once; Bench times each query once).
  */
object ScopedCache {

  def untilConsumed(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cached = df.cache()
    val fragment = cached.queryExecution.analyzed.canonicalized
    val released = new AtomicBoolean(false)
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val consumed =
          try qe.analyzed.find(_.canonicalized == fragment).isDefined
          catch { case scala.util.control.NonFatal(_) => false }
        if (consumed && released.compareAndSet(false, true)) {
          cached.unpersist(false)
          spark.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    cached
  }
}
