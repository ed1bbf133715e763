package graft.queries

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Eviction plumbing for the module-level fixture/stage memos (shingle
  * table, MinHash signatures, chain fixture tables): cached plans are
  * unpersisted and entries dropped when the owning application ends, and
  * [[evict]] is the explicit hook for long-lived multi-session services —
  * without this, a stopped session's cached DataFrames would stay pinned in
  * the object-level maps for the life of the JVM.
  */
private[graft] object Memos {

  private val evictors =
    new java.util.concurrent.ConcurrentLinkedQueue[SparkSession => Unit]()
  private val hookedContexts = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

  /** Register a per-session eviction callback (one per memo map). */
  def register(evictor: SparkSession => Unit): Unit = evictors.add(evictor)

  /** Install the application-end cleanup listener once per SparkContext;
    * call whenever a memo entry is created for `s`.
    */
  def hook(s: SparkSession): Unit =
    if (hookedContexts.add(s.sparkContext))
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evict(s)
          hookedContexts.remove(s.sparkContext)
        }
      })

  /** Drop + unpersist everything memoized for `s`. Unpersist on an
    * already-stopped context throws — at application end the storage is
    * gone anyway, so the entry removal is what matters; swallow it.
    */
  def evict(s: SparkSession): Unit =
    evictors.forEach(f => try f(s) catch { case _: IllegalStateException => () })
}
