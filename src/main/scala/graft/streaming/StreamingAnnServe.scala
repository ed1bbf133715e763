package graft.streaming

import graft.queries.{AnnIndex, SimilarityQueries}
import graft.functions.VectorFunctions.asDouble
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING side of the persistent ANN index (the q130 serve path, fed by
  * a live embedding stream): arriving vectors are routed to their index
  * cell — coarse probe (G = √K dot products) + group-restricted fine
  * assign against the STORED centroid snapshots — with zero training
  * stages per batch. This is the ingestion half of an ANN serving system:
  * the routed (vec_id → cell) stream is what a sharded index consumes to
  * place new vectors, and downstream near-dup checks only ever compare
  * within a cell cohort.
  *
  * Scale shape: each micro-batch costs batch·√K flops and shuffles only on
  * `g_id`/`vec_id` (batch-sized keys); the centroid tables are the
  * snapshot views — read-only, version-stamped, refreshed by
  * [[AnnIndex.refresh]] out-of-band, so a router never trains and a
  * retrain never tears an in-flight batch (the snapshot view swap is
  * atomic and the previous version survives one swap).
  *
  * Routing is PER-VECTOR — each vector's cell depends only on the stored
  * centroids, never on its batch cohort — so any batching of the stream
  * yields byte-identical routes (the spec's stream==batch law).
  */
object StreamingAnnServe {

  /** Stored-index cell assignment of arbitrary embedding rows
    * (`vec_id`, `embedding`) → (`vec_id`, `c_id`): the kernel shared by
    * every micro-batch and by the spec's batch-equivalence oracle. The
    * index must already be mounted (see [[AnnIndex.refresh]]).
    */
  def assignBatch(s: SparkSession, rows: DataFrame,
    prefix: String = "graft_ann_"): DataFrame = {
    graft.functions.DotProductExpression.register(s)
    val e = rows.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val coarse = s.table(prefix + "coarse")
    val fine = s.table(prefix + "fine")
    // identity lineage cut: a micro-batch plan is consumed once — caching
    // it per batch would cost more than the single pass it saves
    val vp = SimilarityQueries.ivf2VecProbes(e, coarse, identity)
    SimilarityQueries.ivf2FinalAssign(vp, coarse, fine, identity)
      .select(col("vec_id"), col("c_id"))
  }

  /** One micro-batch's routed output, written IDEMPOTENTLY: each batch
    * owns `outDir/batch=<batchId>` and overwrites it whole, so the
    * at-least-once replay foreachBatch gives after a crash/restart lands
    * on the same dir instead of appending duplicate (vec_id, c_id) rows
    * (r11 ADVICE). Readers of `outDir` see the usual partition-discovery
    * layout — (vec_id, c_id, batch) — with exactly-once route rows.
    */
  private[graft] def writeRouted(s: SparkSession, batch: DataFrame,
    batchId: Long, outDir: String, prefix: String): Unit =
    assignBatch(s, batch, prefix)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** Start the router: watch `srcDir` for embedding parquet files, route
    * every batch through the stored index, write (vec_id, c_id) under
    * `outDir/batch=<batchId>` (idempotent under foreachBatch's
    * at-least-once replay — see [[writeRouted]]). Mounts/refreshes the
    * index ONCE at start — a corpus change mid-stream is picked up by the
    * next `AnnIndex.refresh` call, not by the router (serving and
    * retraining are deliberately decoupled).
    */
  def route(s: SparkSession, srcDir: String, corpusDir: String,
    outDir: String, checkpointDir: String, prefix: String = "graft_ann_",
    snapshotDir: String = null,
    trigger: Trigger = Trigger.AvailableNow(),
    maxFilesPerTrigger: Int = 0): StreamingQuery = {
    AnnIndex.refresh(s, corpusDir, prefix, snapshotDir)
    val schema = org.apache.spark.sql.types.StructType(
      s.read.parquet(s"$corpusDir/embeddings.parquet").schema
        .filter(f => Set("vec_id", "embedding")(f.name)))
    val reader = s.readStream.schema(schema)
    val bounded = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    bounded.parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeRouted(s, batch, batchId, outDir, prefix)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
