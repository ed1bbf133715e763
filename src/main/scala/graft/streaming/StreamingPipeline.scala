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

  /** The FULL per-doc curation verdict a training-data consumer needs —
    * (doc_id, keep, reason, split) — composed from the two incrementally-
    * maintained surfaces: the gate's verdict stream (exact_dup/blocklist/
    * quality screens) and the label store (near-dup suppression + the
    * leakage-free split routing of `StreamingDupClusters.splitAssignments`,
    * sharing batch q126's `splitOf` expression). This is the streaming twin
    * of batch `q108 ⋈ q126`, evaluated at export-materialization time:
    * a gate-KEPT doc that the label store marks non-canonical flips to
    * (keep=0, near_dup) — exactly q108's rule — and every doc routes by its
    * component representative (self when unpaired). Suppression and split
    * are PROVISIONAL for components still merging (a later lower-id member
    * moves the family together) and final once the component stops growing;
    * after a full replay the output equals the batch composition
    * (StreamingSpec pins the equality). Plan shape: ONE doc_id equi-join
    * against the bucketed label store — no pairwise stage, no data-volume
    * collect.
    */
  def curationVerdicts(spark: org.apache.spark.sql.SparkSession,
    gateVerdicts: org.apache.spark.sql.DataFrame,
    clusters: StreamingDupClusters): org.apache.spark.sql.DataFrame = {
    graft.functions.Hash60Expression.register(spark) // splitOf uses hash64
    gateVerdicts
      .select(col("docId").as("doc_id"), col("reason"))
      .join(clusters.labels(spark), Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("reason") === "kept" && col("cid").isNotNull &&
          col("cid") =!= col("doc_id"), "near_dup")
          .otherwise(col("reason")))
      .withColumn("rep_id", coalesce(col("cid"), col("doc_id")))
      .select(col("doc_id"),
        (col("reason") === "kept").cast("int").as("keep"), col("reason"),
        graft.queries.DedupQueries.splitOf(col("rep_id")).as("split"))
  }
}
