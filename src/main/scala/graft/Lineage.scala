package graft

import org.apache.spark.sql.Dataset

/** The single lineage-cut point for every iterative / multiply-referenced
  * plan in the engine (pageRank supersteps, connected-components label
  * propagation, k-means assignment tables, the fork-replay rebuild…).
  *
  * Mechanism choice (r09 VERDICT #6): `localCheckpoint` materializes the
  * partitions as executor-local blocks — the right call on `local[n]` and
  * for short-lived jobs, but the blocks have NO replica outside the
  * executors, so on a real cluster one lost executor fails the whole query
  * instead of recomputing. When the session has a RELIABLE checkpoint dir
  * configured (`sparkContext.setCheckpointDir(hdfs://…)` — the standard
  * cluster deployment step), [[cut]] therefore switches to a reliable
  * `checkpoint`, which survives executor loss at the cost of one
  * write+read through the checkpoint filesystem. Nothing else about the
  * plan changes — both forms truncate lineage identically, so local runs
  * (no checkpoint dir) keep the exact pre-r10 plans.
  */
object Lineage {

  /** Truncate `ds`'s lineage: reliable `checkpoint` when the session has a
    * checkpoint dir (cluster deployments — survives executor loss),
    * `localCheckpoint` otherwise (local / single-JVM — no extra I/O).
    * `eager = false` keeps the cut lazy (computed at first action), for
    * pin-points inside derivations that may never be executed.
    */
  def cut[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint(eager)
    else ds.localCheckpoint(eager)

  /** `.cutLineage()` — drop-in syntax for what used to be
    * `.localCheckpoint(true)` at every call site.
    */
  implicit class LineageCut[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(eager: Boolean = true): Dataset[T] = cut(ds, eager)
  }
}
