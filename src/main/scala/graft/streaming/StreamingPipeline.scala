package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The composed incremental curation pipeline: clean gate → near-dup
  * pairing over the KEPT stream — the streaming counterpart of the batch
  * q108 → q65 composition (export screens first, then near-dup relations
  * over what survived).
  *
  * One streaming query, two stateful stages (Spark supports chained
  * stateful operators in Append mode): the gate's per-fingerprint state
  * verdicts each arrival, and only documents it KEEPS enter the LSH band
  * state — so a blocklisted or duplicate document never occupies near-dup
  * bucket memory and never surfaces in a pair, exactly like the batch
  * export feeding the clustering stage. Dropping before pairing is also
  * the scale win: near-dup state holds the cleaned corpus's band cohorts,
  * not the raw firehose's.
  */
object StreamingPipeline {

  /** Near-dup pairs among documents the clean gate keeps. Parameters
    * default to the batch q108/q27 set.
    */
  def cleanNearDups(
    docs: Dataset[StreamingCleanExport.Doc],
    blocklist: Seq[String],
    qualityMin: Double,
    numHashes: Int = 12,
    numBands: Int = 3,
    threshold: Double = 0.5): Dataset[StreamingNearDup.NearDupPair] = {
    import docs.sparkSession.implicits._
    val kept = StreamingCleanExport.gateWithText(docs, blocklist, qualityMin)
      .filter(col("keep"))
      .select("docId", "text").as[StreamingNearDup.Doc]
    StreamingNearDup.pairs(kept, numHashes, numBands, threshold)
  }

  /** The TERMINAL composition: gate → near-dup pairs → incremental
    * dup-cluster labels — the streaming counterpart of batch q108's
    * near_dup rule (q65's components gate the export). The returned query
    * maintains `clusters`' label store batch by batch; at any point
    * [[nearDupSuppressed]] answers "which kept docs are non-canonical
    * members of a dup cluster" — the set the incremental clean export
    * drops ON TOP of the gate's own exact-dup/blocklist/quality verdicts.
    * (Append mode cannot retract an already-emitted "kept" verdict, so
    * near-dup suppression is a monotone side artifact consumed at export
    * materialization time — same contract as the gate's canonical-doc
    * policy.)
    */
  def cleanDupClusters(
    docs: Dataset[StreamingCleanExport.Doc],
    blocklist: Seq[String],
    qualityMin: Double,
    clusters: StreamingDupClusters,
    checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    clusters.attach(cleanNearDups(docs, blocklist, qualityMin), checkpoint)

  /** Non-canonical dup-cluster members (doc_id ≠ cid) — the near-dup
    * suppression list over the incrementally-maintained labels.
    */
  def nearDupSuppressed(spark: org.apache.spark.sql.SparkSession,
    clusters: StreamingDupClusters): org.apache.spark.sql.DataFrame =
    clusters.labels(spark).filter(col("doc_id") =!= col("cid"))
}
