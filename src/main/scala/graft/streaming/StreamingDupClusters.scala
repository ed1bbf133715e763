package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import java.nio.file.{Files, Paths}

/** Incremental dup-cluster labels over the streaming near-dup pair stream —
  * the cross-batch counterpart of batch q65's connected components, so the
  * streaming curation pipeline can enforce NEAR-dup (not just exact-dup)
  * suppression as docs arrive.
  *
  * Design (component-bucketed label propagation, not driver union-find):
  * the store keeps the accumulated pair graph and its labels PARTITIONED BY
  * `cb = hash(component cid) % buckets`. A micro-batch of new pairs can
  * only change components it touches, and the store invariant — every edge
  * and label of a component lives in its cid's bucket — means those
  * components are found by partition-pruned reads of the AFFECTED buckets
  * only. Per-batch cost is therefore proportional to the touched dup
  * subgraph, never the accumulated corpus; the superstep kernel is the same
  * [[graft.functions.Clustering.minLabelComponents]] the batch query uses,
  * here running on a few components instead of the whole graph. A merged
  * component's new cid is the min doc id across its members, all of whom
  * were in affected buckets, so rewrites never land outside the deleted
  * range (delete-then-append, the ChainIngest sparse-table discipline —
  * dynamic partition overwrite would leave stale buckets whose components
  * merged away).
  *
  * Crash window: foreachBatch redelivers a batch after a failure between
  * the bucket deletes and the append; the redelivered update re-reads the
  * surviving buckets plus the batch's own pairs, and label propagation is
  * idempotent over a partially-rewritten store ONLY when the batch is
  * replayed — a production deployment pins the affected-bucket list in a
  * progress marker first (exactly [[ChainIngest]]'s `_rebuild_from`
  * pattern), omitted here to keep the kernel readable.
  */
class StreamingDupClusters(val storeDir: String, buckets: Int = 64) {
  require(buckets >= 1, "buckets must be positive")

  private def edgesDir = s"$storeDir/edges"
  private def labelsDir = s"$storeDir/labels"

  private val edgeSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType),
    StructField("cb", LongType)))
  private val labelSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cid", LongType),
    StructField("cb", LongType)))

  private def cbOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(buckets.toLong))

  private def readStore(spark: SparkSession, dir: String,
    schema: StructType): DataFrame =
    if (Files.exists(Paths.get(dir)))
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** The accumulated labels: (doc_id, cid) for every doc that has ever
    * appeared in a pair. Pairless docs are singleton clusters by definition
    * (same contract as the batch `dupLabels`).
    */
  def labels(spark: SparkSession): DataFrame =
    readStore(spark, labelsDir, labelSchema).select("doc_id", "cid")

  /** Fold one micro-batch of near-dup pairs (columns `aId`, `bId`) into the
    * store. The foreachBatch body.
    */
  def update(newPairs: DataFrame): Unit = {
    val spark = newPairs.sparkSession
    // pin the tiny batch once — it seeds affected-bucket discovery, the
    // subgraph, and the rewrite
    val np = newPairs
      .select(least(col("aId"), col("bId")).as("a"),
        greatest(col("aId"), col("bId")).as("b"))
      .distinct().localCheckpoint(true)
    if (np.isEmpty) return

    // affected components: the existing cid of every touched node (self for
    // first-seen nodes); their buckets bound everything this batch can change
    val touched = np.select(col("a").as("doc_id"))
      .unionByName(np.select(col("b").as("doc_id"))).distinct()
    val touchedCids = touched
      .join(labels(spark), Seq("doc_id"), "left")
      .select(coalesce(col("cid"), col("doc_id")).as("cid"))
    val affected = touchedCids.select(cbOf(col("cid")).as("cb")).distinct()
      .collect().map(_.getLong(0)).toSet

    // partition-pruned read of the affected buckets (superset: unrelated
    // components sharing a bucket re-label to their unchanged cid)
    val inAffected = (c: org.apache.spark.sql.Column) =>
      c.isInCollection(affected.toSeq)
    val oldEdges = readStore(spark, edgesDir, edgeSchema)
      .filter(inAffected(col("cb"))).select("a", "b")
    // EAGER pin before the bucket deletes below: the rewrite plans must
    // never lazily re-read store files this update is about to remove
    val subEdges = oldEdges.unionByName(np).distinct().localCheckpoint(true)
    val doubled = subEdges
      .select(col("a").as("src"), col("b").as("dst"))
      .unionByName(subEdges.select(col("b").as("src"), col("a").as("dst")))
    val relabeled = graft.functions.Clustering.minLabelComponents(doubled)
      .toDF("doc_id", "cid").localCheckpoint(true)
    val edgesWithCid = subEdges.join(
      relabeled.select(col("doc_id").as("a"), col("cid").as("ecid")), "a")

    // merged cids are minima over affected members, so every rewrite lands
    // inside the deleted range; delete-then-append keeps emptied buckets
    // from retaining stale component data
    affected.foreach { k =>
      ChainIngest.rmTree(s"$edgesDir/cb=$k")
      ChainIngest.rmTree(s"$labelsDir/cb=$k")
    }
    edgesWithCid.select(col("a"), col("b"), cbOf(col("ecid")).as("cb"))
      .write.mode(SaveMode.Append).partitionBy("cb").parquet(edgesDir)
    relabeled.select(col("doc_id"), col("cid"), cbOf(col("cid")).as("cb"))
      .write.mode(SaveMode.Append).partitionBy("cb").parquet(labelsDir)
  }

  /** Wire the label store behind a near-dup pair stream. */
  def attach(pairs: Dataset[StreamingNearDup.NearDupPair], checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    pairs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: Dataset[StreamingNearDup.NearDupPair], _: Long) =>
        update(b.toDF())
      }
      .start()
}
