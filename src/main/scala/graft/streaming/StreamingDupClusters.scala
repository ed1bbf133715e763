package graft.streaming

import graft.Lineage.LineageCut

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
  * EDGES are partitioned by `hash(component cid) % buckets` — the store
  * invariant that every edge of a component lives in its cid's bucket
  * means a batch's touched components are read from ONLY the affected
  * buckets, and a merged component's new cid (the min member id) provably
  * hashes into the affected set, so edge rewrites never create data
  * outside it. LABELS are partitioned by `hash(doc_id) % buckets` —
  * doc-keyed, because resolving "what component is this touched doc in"
  * must be a partition-PRUNED point lookup (a cid-keyed layout is
  * unknowable from a doc id and would force a full-store scan per batch).
  * Per-batch cost is bounded by the touched dup subgraph plus the touched
  * label buckets (each 1/buckets of the label table — size `buckets` to
  * the corpus); the superstep kernel is the same
  * [[graft.functions.Clustering.minLabelComponents]] the batch query
  * uses, here running on a few components instead of the whole graph.
  *
  * Crash safety (the [[ChainIngest]] MVCC discipline, not delete-then-
  * append): bucket data is IMMUTABLE and versioned
  * (`edges/cb=K/v=N`, `labels/cb=K/v=N`); each update writes fresh
  * versions for the affected buckets only, then publishes a MANIFEST
  * (bucket → version for both tables) via atomic tmp+rename. Readers and
  * the next update resolve through the latest manifest, so a crash
  * anywhere before the publish leaves the previous state fully intact and
  * the redelivered batch replays against it; a crash after the publish
  * replays idempotently (the batch's pairs are already in the subgraph, so
  * re-labeling reproduces the same components). Versions no longer
  * referenced by the latest manifest are GC'd after publish.
  */
class StreamingDupClusters(val storeDir: String, buckets: Int = 64) {
  require(buckets >= 1, "buckets must be positive")

  private val edgeSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))
  private val labelSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("cid", LongType)))

  private def cbOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(buckets.toLong))

  // ---- manifest: bucket -> version, for the edges and labels tables ----
  // one line per entry: "<table>,<bucket>,<version>"; published atomically.

  private def manifestDir = Paths.get(s"$storeDir/manifest")

  private def manifestVersions(): Seq[Long] =
    if (!Files.exists(manifestDir)) Nil
    else {
      val stream = Files.list(manifestDir)
      try stream.toArray.toSeq.map(_.toString)
        .map(s => s.substring(s.lastIndexOf('/') + 1))
        .filter(_.matches("m=\\d+"))
        .map(_.drop(2).toLong).sorted
      finally stream.close()
    }

  private def readManifest(): Map[(String, Long), Long] =
    manifestVersions().lastOption.map { m =>
      Files.readString(manifestDir.resolve(s"m=$m")).linesIterator
        .filter(_.nonEmpty)
        .map { line =>
          val Array(t, b, v) = line.split(",")
          (t, b.toLong) -> v.toLong
        }.toMap
    }.getOrElse(Map.empty)

  private def readManifestAt(m: Long): Map[(String, Long), Long] =
    Files.readString(manifestDir.resolve(s"m=$m")).linesIterator
      .filter(_.nonEmpty)
      .map { line =>
        val Array(t, b, v) = line.split(",")
        (t, b.toLong) -> v.toLong
      }.toMap

  // ---- read leases: a pinned reader exempts its manifest (and every
  // version it references) from GC until closed ----
  private val leases = scala.collection.mutable.Map.empty[Long, Int]
  // One lock serializes {read head + take lease} against {publish + GC}:
  // without it, a pin taken concurrently with two rapid publishes could
  // lease a manifest whose files the second publish already GC'd — the
  // two-head grace only covers one intervening publish (r08 ADVICE).
  // publishManifest is called from the store's own update path (already
  // effectively serial per store), so the lock adds no contention there.
  private val gcLock = new Object

  private def publishManifest(entries: Map[(String, Long), Long]): Unit = gcLock.synchronized {
    Files.createDirectories(manifestDir)
    val next = manifestVersions().lastOption.getOrElse(-1L) + 1
    val body = entries.toSeq.sortBy { case ((t, b), _) => (t, b) }
      .map { case ((t, b), v) => s"$t,$b,$v" }.mkString("\n")
    val tmp = manifestDir.resolve(s"m=$next.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestDir.resolve(s"m=$next"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // GC with two-head retention + leases: a TRANSIENT frame handed out by
    // labels() before this update still references the PREVIOUS head's
    // versions, which the two-head keep-set protects for exactly one
    // publish — the documented transient contract. Readers that must
    // outlive that (dashboards, long joins) hold a [[pinnedLabels]] lease,
    // whose manifest (and the versions it references) survives GC until
    // close(). Best-effort as before: a crash here only leaves garbage,
    // never corruption.
    val keep = manifestVersions().takeRight(2).toSet ++
      leases.synchronized(leases.keySet.toSet)
    val heads = manifestVersions().filter(keep.contains)
    val live: Set[(String, Long, Long)] = heads.flatMap(m =>
      readManifestAt(m).map { case ((t, b), v) => (t, b, v) }).toSet
    manifestVersions().filterNot(keep.contains)
      .foreach(m => Files.deleteIfExists(manifestDir.resolve(s"m=$m")))
    Seq("edges", "labels").foreach { t =>
      val root = Paths.get(s"$storeDir/$t")
      if (Files.exists(root)) {
        val bs = Files.list(root)
        try bs.toArray.map(_.toString).foreach { bdir =>
          val b = bdir.substring(bdir.lastIndexOf('=') + 1).toLongOption
          b.foreach { bucket =>
            val vs = Files.list(Paths.get(bdir))
            try vs.toArray.map(_.toString)
              .filter { vdir =>
                val tail = vdir.substring(vdir.lastIndexOf('/') + 1)
                tail.matches("v=\\d+") && !live.contains((t, bucket, tail.drop(2).toLong))
              }
              .foreach(ChainIngest.rmTree)
            finally vs.close()
          }
        } finally bs.close()
      }
    }
  }

  private def readBuckets(spark: SparkSession, table: String,
    manifest: Map[(String, Long), Long], schema: StructType,
    only: Option[Set[Long]] = None): DataFrame = {
    val dirs = manifest.collect {
      case ((t, b), v) if t == table && only.forall(_.contains(b)) =>
        s"$storeDir/$table/cb=$b/v=$v"
    }.toSeq
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** The accumulated labels: (doc_id, cid) for every doc that has ever
    * appeared in a pair. Pairless docs are singleton clusters by definition
    * (same contract as the batch `dupLabels`).
    *
    * READ CONTRACT — transient: the lazy frame resolves the CURRENT
    * manifest; the two-head GC retention guarantees its files survive
    * exactly ONE subsequent [[update]]. A reader held across more updates
    * than that must use [[pinnedLabels]], which leases its manifest out of
    * GC until closed.
    */
  def labels(spark: SparkSession): DataFrame =
    readBuckets(spark, "labels", readManifest(), labelSchema)

  /** A labels frame PINNED to the manifest it resolved: the store's GC
    * exempts that manifest (and every bucket version it references) until
    * [[PinnedLabels.close]], so the frame stays readable across any number
    * of interleaved updates — the long-lived-reader form of [[labels]]
    * (dashboards, multi-pass jobs). The snapshot is immutable by
    * construction (bucket versions are never rewritten), so the pinned
    * frame also never sees a torn mix of old and new buckets.
    */
  final class PinnedLabels private[StreamingDupClusters](
    val df: DataFrame, manifestId: Long) extends AutoCloseable {
    private val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    /** Idempotent — a double close must not release another pin's lease. */
    override def close(): Unit =
      if (manifestId >= 0 && released.compareAndSet(false, true))
        leases.synchronized {
          leases.updateWith(manifestId)(_.map(_ - 1).filter(_ > 0))
        }
  }

  def pinnedLabels(spark: SparkSession): PinnedLabels = {
    // head read + lease registration are ONE atomic step under the same
    // lock publishManifest's GC holds — a publish can therefore never run
    // between reading the head and protecting it (r08 ADVICE race). Once
    // the lease exists the manifest and its bucket versions are GC-exempt,
    // so the file reads below are safe outside the lock.
    val m = gcLock.synchronized {
      val head = manifestVersions().lastOption.getOrElse(-1L)
      if (head >= 0) leases.synchronized {
        leases.updateWith(head)(c => Some(c.getOrElse(0) + 1))
      }
      head
    }
    val manifest = if (m >= 0) readManifestAt(m)
    else Map.empty[(String, Long), Long]
    new PinnedLabels(
      readBuckets(spark, "labels", manifest, labelSchema), m)
  }

  /** Leakage-free split assignment over the CURRENT label store — the
    * streaming twin of the batch q126 operator, sharing its routing
    * expression (`DedupQueries.splitOf`) so the two surfaces cannot drift.
    * Docs with a stored label route by their component's representative;
    * pairless docs self-represent. An assignment read mid-stream is
    * PROVISIONAL for docs whose component is still merging (a later,
    * lower-id member moves the whole family — together — to the new rep's
    * split); once the component stops growing it equals the batch
    * assignment (StreamingSpec pins the equality after a full replay).
    */
  def splitAssignments(spark: SparkSession, docIds: DataFrame): DataFrame = {
    graft.functions.Hash60Expression.register(spark) // splitOf uses hash64
    docIds.select(col("doc_id"))
      .join(labels(spark), Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cid"), col("doc_id")))
      .select(col("doc_id"), col("rep_id"),
        graft.queries.DedupQueries.splitOf(col("rep_id")).as("split"))
  }

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
      .distinct().cutLineage()
    if (np.isEmpty) return
    val manifest = readManifest()

    // resolve the touched docs' existing cids (self for first-seen nodes)
    // through a partition-PRUNED read of only their doc-hash label buckets
    val touched = np.select(col("a").as("doc_id"))
      .unionByName(np.select(col("b").as("doc_id"))).distinct()
      .cutLineage()
    val touchedDocBuckets = touched.select(cbOf(col("doc_id")).as("cb"))
      .distinct().collect().map(_.getLong(0)).toSet
    val touchedCids = touched
      .join(readBuckets(spark, "labels", manifest, labelSchema,
        only = Some(touchedDocBuckets)), Seq("doc_id"), "left")
      .select(coalesce(col("cid"), col("doc_id")).as("cid"))
    val affected = touchedCids.select(cbOf(col("cid")).as("cb")).distinct()
      .collect().map(_.getLong(0)).toSet

    // read ONLY the affected edge buckets (superset: unrelated components
    // sharing a bucket re-label to their unchanged cid)
    val oldEdges = readBuckets(spark, "edges", manifest, edgeSchema,
      only = Some(affected))
    val subEdges = oldEdges.unionByName(np).distinct().cutLineage()
    val doubled = subEdges
      .select(col("a").as("src"), col("b").as("dst"))
      .unionByName(subEdges.select(col("b").as("src"), col("a").as("dst")))
    val relabeled = graft.functions.Clustering.minLabelComponents(doubled)
      .toDF("doc_id", "cid").cutLineage()
    val edgesWithCid = subEdges.join(
      relabeled.select(col("doc_id").as("a"), col("cid").as("ecid")), "a")

    // label rewrite: doc-bucketed, so only the buckets holding re-labeled
    // members change — each new bucket version carries the bucket's
    // UNtouched rows plus the fresh member labels
    val memberBuckets = relabeled.select(cbOf(col("doc_id")).as("cb"))
      .distinct().collect().map(_.getLong(0)).toSet
    val newLabels = readBuckets(spark, "labels", manifest, labelSchema,
      only = Some(memberBuckets))
      .join(relabeled.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(relabeled)
      .cutLineage() // pin before the staged writes below

    // edge rewrites land inside the affected cid-bucket set (merged cids
    // are minima over affected members); write fresh immutable versions,
    // then publish. Buckets that emptied (components merged away) simply
    // drop out of the manifest.
    val nextV = manifest.values.maxOption.getOrElse(-1L) + 1
    def writeBucketed(df: DataFrame, table: String, keyCol: String): Set[Long] = {
      val withCb = df.withColumn("cb", cbOf(col(keyCol)))
      val present = withCb.select("cb").distinct()
        .collect().map(_.getLong(0)).toSet
      // a crashed prior attempt of this same version may have left a
      // half-written staging dir — clear it so the rewrite starts clean
      ChainIngest.rmTree(s"$storeDir/.staging-$table-v=$nextV")
      withCb.write.mode(SaveMode.Append).partitionBy("cb")
        .parquet(s"$storeDir/.staging-$table-v=$nextV")
      // move each staged bucket dir to its immutable versioned home
      present.foreach { b =>
        val dst = Paths.get(s"$storeDir/$table/cb=$b/v=$nextV")
        Files.createDirectories(dst.getParent)
        ChainIngest.rmTree(dst.toString) // crashed prior attempt of same v
        Files.move(Paths.get(s"$storeDir/.staging-$table-v=$nextV/cb=$b"), dst)
      }
      ChainIngest.rmTree(s"$storeDir/.staging-$table-v=$nextV")
      present
    }
    val edgeBuckets = writeBucketed(
      edgesWithCid.select(col("a"), col("b"), col("ecid")), "edges", "ecid")
    val labelBuckets = writeBucketed(newLabels, "labels", "doc_id")

    val next = (manifest
      -- affected.map(b => ("edges", b))
      -- memberBuckets.map(b => ("labels", b))) ++
      edgeBuckets.map(b => ("edges", b) -> nextV) ++
      labelBuckets.map(b => ("labels", b) -> nextV)
    publishManifest(next)
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
