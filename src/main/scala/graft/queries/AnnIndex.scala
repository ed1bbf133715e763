package graft.queries

import graft.{GraftEngine, Lineage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent two-level IVF index (r09 VERDICT #4).
  *
  * q32/q113/q129 re-train k-means on every invocation — the right shape for
  * the oracle-checked ad-hoc form, the wrong one at 100 TB, where an index
  * is trained ONCE and served many times. [[mount]] runs q129's training
  * (coarse quantizer, G = ⌈√K⌉ rows; trained fine centroids, K rows) and
  * materializes both tables as versioned catalog snapshots through the
  * shared [[GraftEngine.swapSnapshotView]] machinery — atomic view swap,
  * previous version retained one swap for in-flight readers, per-root
  * serialization. [[servedPairs]] then answers near-dup queries with ZERO
  * training stages: one coarse probe pass (n·G flops) + the
  * group-restricted assign against the STORED centroids (n·√K) + the
  * shared compiled pair kernel. Training and serving share the exact same
  * restricted-assign arithmetic, so a served answer on an up-to-date index
  * is row-identical to q129 — q130's driver oracle is literally q129's.
  *
  * Freshness model ([[GraftEngine.refreshCatalog]]'s, applied to a file
  * corpus): the index carries the corpus parquet fingerprint
  * ((file, length, mtime) digest) both as a view property and as a durable
  * `_corpus_version` file next to the snapshots. [[refresh]] retrains only
  * when the fingerprint advanced; a NEW application (empty in-memory
  * catalog) whose fingerprint still matches the durable stamp re-registers
  * the views over the existing snapshot files without retraining — the
  * cross-application train-once contract.
  *
  * Cross-PROCESS refresh safety (r10 ADVICE): two applications sharing one
  * snapshot root can race past each other's JVM-local locks. The shared
  * swap machinery therefore writes each snapshot to a unique temp dir and
  * claims `v=<next>` by ATOMIC RENAME ([[GraftEngine.claimVersion]]) — the
  * loser adopts the winner's fully-written dir (training is deterministic
  * for a given corpus fingerprint, so both racers derive identical
  * centroids), and no v= dir is ever observable half-written.
  */
object AnnIndex {

  val VersionProp = "graft.ann.corpus.version"

  /** Mount/retrain invocations — the spec's "no second Lloyd pass" probe. */
  private[graft] var trainCount = 0

  /** Content fingerprint of the embeddings table's parquet files — the
    * corpus analog of the chain warehouse's commit version: any rewrite,
    * append, or replacement advances it. Walks the tree RECURSIVELY and
    * digests every LEAF file's full path + length + mtime (r10 ADVICE: a
    * direct-children-only listing misses an in-place leaf rewrite inside a
    * partitioned layout — a dir's name/len never change and its mtime only
    * moves when entries are added or removed).
    */
  def corpusVersion(s: SparkSession, dir: String): String =
    md5Hex(leafSigs(s, dir).mkString(","))

  /** Sorted per-leaf signatures (`path:len:mtime`) — the fingerprint's raw
    * material, and the append-vs-rewrite discriminator for
    * [[refreshIncremental]].
    */
  private[graft] def leafSigs(s: SparkSession, dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq("absent")
    else {
      // listFiles(recursive = true) yields leaf FILES only (a plain-file
      // corpus yields itself), so nested dir layers contribute nothing
      // and every byte-bearing leaf contributes path:len:mtime
      val it = fs.listFiles(p, true)
      val leaves = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        leaves += s"${st.getPath.toUri.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      leaves.sorted.toSeq
    }
  }

  private def md5Hex(sig: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def leafPath(sig: String): String = {
    // path:len:mtime — len and mtime are digit runs after the LAST two
    // colons (paths may themselves contain ':')
    val a = sig.lastIndexOf(':')
    sig.substring(0, sig.lastIndexOf(':', a - 1))
  }

  private def leafLen(sig: String): Long = {
    val a = sig.lastIndexOf(':')
    sig.substring(sig.lastIndexOf(':', a - 1) + 1, a).toLong
  }

  /** Stable default location, like the corpus catalog's: under the session
    * warehouse dir, scoped by prefix, so a durable catalog's view paths
    * survive process restarts.
    */
  private def defaultRoot(s: SparkSession, prefix: String): String =
    s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
      s"/_graft_ann_index/$prefix"

  /** The corpus fingerprint the mounted index was trained at (None when
    * never mounted in this application's catalog).
    */
  def indexVersion(s: SparkSession, prefix: String = "graft_ann_"): Option[String] =
    if (!s.catalog.tableExists(prefix + "fine")) None
    else s.sql(s"SHOW TBLPROPERTIES ${prefix}fine")
      .filter(col("key") === VersionProp)
      .collect().headOption.map(_.getString(1))

  private def fs(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sessionState.newHadoopConf()), p)
  }

  /** The durable (cross-application) fingerprint stamp. */
  private def storedVersion(s: SparkSession, root: String): Option[String] =
    readMeta(s, s"$root/_corpus_version").map(_.trim)

  /** The durable leaf manifest the index was built over (newline-joined
    * [[leafSigs]]) — what lets [[refreshIncremental]] tell an APPEND from
    * a rewrite.
    */
  private def storedLeaves(s: SparkSession, root: String): Option[Seq[String]] =
    readMeta(s, s"$root/_corpus_files").map(_.trim.split("\n").toSeq)

  private def readMeta(s: SparkSession, path: String): Option[String] = {
    val (f, p) = fs(s, path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    }
  }

  private def writeMeta(s: SparkSession, root: String, ver: String,
    leaves: Seq[String]): Unit = {
    val (f, pf) = fs(s, s"$root/_corpus_files")
    val o1 = f.create(pf, true)
    try o1.write(leaves.mkString("\n").getBytes("UTF-8")) finally o1.close()
    // the version stamp is written LAST: a crash in between leaves a stale
    // stamp and the next refresh simply retrains — never a torn adopt
    val (g, pv) = fs(s, s"$root/_corpus_version")
    val o2 = g.create(pv, true)
    try o2.write(ver.getBytes("UTF-8")) finally o2.close()
  }

  private def latestSnapshot(s: SparkSession, root: String): Option[String] = {
    val (f, p) = fs(s, root)
    if (!f.exists(p)) None
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v=")).flatMap(_.drop(2).toLongOption)
      .sorted.lastOption.map(v => s"$root/v=$v")
  }

  private def registerOver(s: SparkSession, name: String, path: String,
    ver: String): Unit =
    s.sql(s"CREATE OR REPLACE VIEW $name " +
      s"TBLPROPERTIES ('$VersionProp' = '$ver') " +
      s"AS SELECT * FROM parquet.`$path`")

  /** Train ONCE and snapshot: coarse + fine centroid tables land under
    * `root/{coarse,fine}/v=<k>` with the catalog views swapped atomically,
    * and the durable fingerprint stamp is written last (a crash before it
    * just retrains on the next mount — never serves a torn index).
    */
  def mount(s: SparkSession, dir: String, prefix: String = "graft_ann_",
    snapshotDir: String = null): Unit = s.synchronized {
    import SimilarityQueries._
    val root = Option(snapshotDir).getOrElse(defaultRoot(s, prefix))
    // one listing: the manifest and the stamp must describe the SAME
    // corpus state even if files land mid-mount
    val leaves = leafSigs(s, dir)
    val ver = md5Hex(leaves.mkString(","))
    val cut: DataFrame => DataFrame = Lineage.cut(_)
    val e = ivf2Corpus(s, dir)
    val (k, g) = ivf2KG(e)
    val coarse = ivf2TrainCoarse(e, g, cut)
    val vecProbes = ivf2VecProbes(e, coarse, cut)
    val fine = ivf2TrainFine(e, k, coarse, vecProbes, cut)
    GraftEngine.swapSnapshotView(s, prefix + "coarse", coarse,
      s"$root/coarse", Map(VersionProp -> ver))
    GraftEngine.swapSnapshotView(s, prefix + "fine", fine,
      s"$root/fine", Map(VersionProp -> ver))
    // the inverted lists themselves (r09 VERDICT #4's "optionally
    // assignments"): (vec_id, c_id) is tiny next to the corpus, and a
    // stored assignment turns every later serve's n·√K probe+assign
    // stages into one vec_id equi-join against the corpus
    GraftEngine.swapSnapshotView(s, prefix + "assign",
      ivf2FinalAssign(vecProbes, coarse, fine, cut).select("vec_id", "c_id"),
      s"$root/assign", Map(VersionProp -> ver))
    writeMeta(s, root, ver, leaves)
    trainCount += 1
  }

  /** Retrain only when the corpus fingerprint advanced; re-register (no
    * retrain) when a fresh application finds matching snapshots on disk.
    * Returns whether a RETRAIN ran.
    */
  def refresh(s: SparkSession, dir: String, prefix: String = "graft_ann_",
    snapshotDir: String = null): Boolean = s.synchronized {
    val root = Option(snapshotDir).getOrElse(defaultRoot(s, prefix))
    val cur = corpusVersion(s, dir)
    if (indexVersion(s, prefix).contains(cur)) false
    else if (storedVersion(s, root).contains(cur) &&
      latestSnapshot(s, s"$root/coarse").isDefined &&
      latestSnapshot(s, s"$root/fine").isDefined) {
      // snapshots from a previous application are current — adopt them
      registerOver(s, prefix + "coarse", latestSnapshot(s, s"$root/coarse").get, cur)
      registerOver(s, prefix + "fine", latestSnapshot(s, s"$root/fine").get, cur)
      // assign lists may predate their introduction — adopt when present,
      // else servedPairs falls back to the probe+assign path
      latestSnapshot(s, s"$root/assign").foreach(p =>
        registerOver(s, prefix + "assign", p, cur))
      false
    } else { mount(s, dir, prefix, snapshotDir); true }
  }

  /** Outcome of [[refreshIncremental]]. */
  sealed trait Maintenance
  object Maintenance {
    /** Index already matches the corpus. */
    case object NoChange extends Maintenance
    /** Append-only growth: `nNewVectors` routed through the STORED
      * centroids and merged into the inverted lists — no retraining.
      */
    final case class Appended(nNewVectors: Long) extends Maintenance
    /** A rewrite, a missing manifest, or growth past the drift bound —
      * full retrain ran.
      */
    case object Retrained extends Maintenance
  }

  /** Day-2 index maintenance: an append-only corpus (old parquet leaves
    * byte-identical, new leaves added — the ingest shape) EXTENDS the
    * index instead of retraining it. New vectors route through the stored
    * centroids with the exact serving arithmetic (the same kernel the
    * streaming router uses), the inverted lists are rewritten as
    * old ∪ new (lists are two longs per probe — ~1% of corpus bytes; a
    * delta-chain is the documented plug point past that), and every view
    * re-stamps to the new corpus fingerprint, so [[servedPairs]] keeps
    * its fast path with zero Lloyd stages end to end.
    *
    * Drift bound: appended vectors join EXISTING clusters, so cluster
    * sizes grow with the corpus while K stays fixed — past `maxGrowth`
    * (new bytes / indexed bytes) the adaptive-K contract is violated and
    * a full retrain is the right spend. Any non-append change (an old
    * leaf rewritten or removed) retrains unconditionally: assignments
    * derived from vanished bytes can't be trusted incrementally.
    */
  def refreshIncremental(s: SparkSession, dir: String,
    prefix: String = "graft_ann_", snapshotDir: String = null,
    maxGrowth: Double = 0.5): Maintenance = s.synchronized {
    import SimilarityQueries._
    val root = Option(snapshotDir).getOrElse(defaultRoot(s, prefix))
    val curLeaves = leafSigs(s, dir)
    val cur = md5Hex(curLeaves.mkString(","))
    if (indexVersion(s, prefix).contains(cur)) Maintenance.NoChange
    else {
      val old = storedLeaves(s, root)
      val oldVer = old.map(ls => md5Hex(ls.mkString(",")))
      val append = old.isDefined &&
        storedVersion(s, root) == oldVer &&
        old.get.toSet.subsetOf(curLeaves.toSet) &&
        old.get.toSet != curLeaves.toSet
      val withinDrift = append && {
        val grown = (curLeaves.toSet -- old.get.toSet).toSeq.map(leafLen).sum
        grown.toDouble <= maxGrowth * math.max(1L, old.get.map(leafLen).sum)
      }
      if (!withinDrift) {
        if (refresh(s, dir, prefix, snapshotDir)) Maintenance.Retrained
        else Maintenance.NoChange
      } else {
        // make sure the OLD-version index is mounted (fresh application:
        // adopt the snapshots before extending them)
        if (!indexVersion(s, prefix).exists(oldVer.contains(_))) {
          registerOver(s, prefix + "coarse",
            latestSnapshot(s, s"$root/coarse").get, oldVer.get)
          registerOver(s, prefix + "fine",
            latestSnapshot(s, s"$root/fine").get, oldVer.get)
          latestSnapshot(s, s"$root/assign").foreach(p =>
            registerOver(s, prefix + "assign", p, oldVer.get))
        }
        if (storedAssign(s, prefix).isEmpty) {
          // centroid-only legacy root: nothing to extend — retrain
          mount(s, dir, prefix, snapshotDir); Maintenance.Retrained
        } else {
          graft.functions.DotProductExpression.register(s)
          // The manifest stores scheme-stripped paths (stable fingerprint
          // material); a READ must re-qualify them against the corpus
          // dir's OWN filesystem, or on a non-default FS (s3a://…, a
          // second hdfs://…) the strings would resolve against
          // fs.defaultFS and read the wrong location (r11 ADVICE)
          val corpusFs = {
            val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
            p.getFileSystem(s.sessionState.newHadoopConf())
          }
          val newPaths = (curLeaves.toSet -- old.get.toSet).toSeq
            .map(leafPath).sorted
            .map(p => corpusFs.makeQualified(
              new org.apache.hadoop.fs.Path(p)).toString)
          val e = s.read.parquet(newPaths: _*)
            .select(col("vec_id"),
              graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
          val n = e.count()
          val cut: DataFrame => DataFrame = Lineage.cut(_)
          val coarse = s.table(prefix + "coarse")
          val fine = s.table(prefix + "fine")
          val newAssign = ivf2FinalAssign(
            ivf2VecProbes(e, coarse, cut), coarse, fine, cut)
            .select("vec_id", "c_id")
          val unioned = s.table(prefix + "assign").unionByName(newAssign)
          GraftEngine.swapSnapshotView(s, prefix + "assign", unioned,
            s"$root/assign", Map(VersionProp -> cur))
          registerOver(s, prefix + "coarse",
            latestSnapshot(s, s"$root/coarse").get, cur)
          registerOver(s, prefix + "fine",
            latestSnapshot(s, s"$root/fine").get, cur)
          writeMeta(s, root, cur, curLeaves)
          Maintenance.Appended(n)
        }
      }
    }
  }

  /** The stored inverted lists, when mounted AND stamped with the current
    * index version (an older root written before assignment persistence
    * simply yields None).
    */
  private def storedAssign(s: SparkSession, prefix: String): Option[DataFrame] =
    if (!s.catalog.tableExists(prefix + "assign")) None
    else {
      val av = s.sql(s"SHOW TBLPROPERTIES ${prefix}assign")
        .filter(col("key") === VersionProp)
        .collect().headOption.map(_.getString(1))
      if (av.isDefined && av == indexVersion(s, prefix))
        Some(s.table(prefix + "assign"))
      else None
    }

  /** SERVE near-dup pairs from the stored index: no Lloyd pass, no seed
    * training — probe + restricted assign against the snapshot tables +
    * the shared pair kernel. Self-initializing: the first call on a new
    * corpus (or a stale index) mounts; every later call reuses.
    * `cut` is pluggable for plan inspection (PlanSpec/AnnIndexSpec pin
    * that the served plan reads parquet snapshots and contains no
    * centroid-update aggregation).
    */
  def servedPairs(s: SparkSession, dir: String, prefix: String = "graft_ann_",
    snapshotDir: String = null,
    cut: DataFrame => DataFrame = Lineage.cut(_)): DataFrame = {
    import SimilarityQueries._
    refresh(s, dir, prefix, snapshotDir)
    val e = ivf2Corpus(s, dir)
    storedAssign(s, prefix) match {
      case Some(assign) =>
        // fast path: the stored inverted lists already hold (vec_id, c_id)
        // from the identical restricted-assign arithmetic at mount time —
        // a serve is one vec_id equi-join + the pair kernel, zero flops of
        // probe or assign
        ivf2Pairs(cut(e.join(assign, "vec_id")
          .withColumn("n", graft.functions.VectorFunctions.l2NormNative(col("v")))
          .select("vec_id", "v", "n", "c_id")))
      case None =>
        // pre-assign-persistence snapshot root: centroids only
        val coarse = s.table(prefix + "coarse")
        val fine = s.table(prefix + "fine")
        val vecProbes = ivf2VecProbes(e, coarse, cut)
        ivf2Pairs(ivf2FinalAssign(vecProbes, coarse, fine, cut))
    }
  }
}
