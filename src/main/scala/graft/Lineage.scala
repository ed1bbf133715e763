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
    *
    * Reliable checkpointing runs TWO jobs — the materializing action and
    * the checkpoint-file write — and without a persist the second job
    * recomputes the whole plan (r10 ADVICE). [[cut]] therefore persists
    * the dataset first (the write job then reads the cached blocks — one
    * compute total) and unpersists as soon as the eager checkpoint holds
    * the data. Lazy cuts keep the persist until the context cleaner drops
    * it with the dataset reference (there is no post-materialization hook
    * to unpersist from; both lazy sites are session-lived pin-points).
    *
    * Checkpoint-file lifetime: Spark never deletes reliable checkpoint
    * files by default. Long-lived serving sessions that cut inside loops
    * should submit with `spark.cleaner.referenceTracking.cleanCheckpoints
    * =true` (a SparkConf-at-launch setting — it cannot be flipped on a
    * running context, so it is documented here and in README rather than
    * set by the engine).
    */
  def cut[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val persisted =
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cp = persisted.checkpoint(eager)
      if (eager) persisted.unpersist(blocking = false)
      cp
    } else ds.localCheckpoint(eager)

  /** `.cutLineage()` — drop-in syntax for what used to be
    * `.localCheckpoint(true)` at every call site.
    */
  implicit class LineageCut[T](private val ds: Dataset[T]) extends AnyVal {
    def cutLineage(eager: Boolean = true): Dataset[T] = cut(ds, eager)
  }
}
