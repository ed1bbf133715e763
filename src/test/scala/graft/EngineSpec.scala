package graft

import graft.chain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end facade test: the reference-user workflow (backfill → query
  * surface) through GraftEngine, plus the crash-heal integrity path.
  */
class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("backfill then serve the full query surface through the facade") {
    import spark.implicits._
    val n = 50
    val base = Files.createTempDirectory("graft-engine").toString
    BlockSource.writeJsonLines(
      spark.createDataset(ChainFixture.generate(n)), s"$base/blocks")

    val engine = new GraftEngine(spark, s"$base/warehouse")
    engine.backfill(s"$base/blocks")

    val direct = BlockDerivation.derive(spark.createDataset(ChainFixture.generate(n)))
    assert(engine.utxos.count() == UtxoQueries.utxos(direct).count())
    assert(engine.lastBlocks(5).collect().map(_.getAs[Int]("height")).toSeq ==
      Seq(n, n - 1, n - 2, n - 3, n - 4))
    assert(engine.missingHeights(n).count() == 0)
    assert(engine.topAddressesByValue(3).count() == 3)
    assert(engine.epochRollup.count() == 1) // 50 blocks < one 1024 epoch
    assert(engine.txEdges.count() > 0)

    // box matrix through the facade: pick a real address, flagship query
    val addr = engine.tables.ergoTrees.orderBy("hash").limit(1)
      .select("address").head.getString(0)
    val unspent = engine.boxesByAddress(UtxoQueries.Unspent, addr).count()
    val spent = engine.boxesByAddress(UtxoQueries.Spent, addr).count()
    val any = engine.boxesByAddress(UtxoQueries.Any, addr).count()
    assert(unspent + spent == any && any > 0)

    // the same box matrix through the SQL surface: registered views + plain
    // SQL strings must agree with the Scala facade exactly
    engine.registerViews()
    def sqlCount(q: String): Long = spark.sql(q).count()
    def byAddrSql(view: String): Long = sqlCount(
      s"""SELECT b.* FROM $view b JOIN graft_ergo_trees d
          ON b.ergoTreeHash = d.hash WHERE d.address = '$addr'""")
    assert(byAddrSql("graft_utxo") == unspent)
    assert(byAddrSql("graft_spent_boxes") == spent)
    assert(byAddrSql("graft_outputs") == any)
    val hash = engine.tables.ergoTrees.filter(col("address") === addr)
      .select("hash").head.getString(0)
    assert(sqlCount(s"SELECT * FROM graft_utxo WHERE ergoTreeHash = '$hash'") ==
      engine.boxesByErgoTreeHash(UtxoQueries.Unspent, hash).count())
    val tok = engine.tables.assets.select("tokenId").head.getString(0)
    assert(sqlCount(
      s"""SELECT b.* FROM graft_utxo b WHERE EXISTS
          (SELECT 1 FROM graft_assets a
           WHERE a.boxId = b.boxId AND a.tokenId = '$tok')""") ==
      engine.boxesByTokenId(UtxoQueries.Unspent, tok).count())
    val someBox = engine.tables.outputs.select("boxId").head.getString(0)
    assert(sqlCount(s"SELECT * FROM graft_outputs WHERE boxId = '$someBox'") ==
      engine.boxesByIds(UtxoQueries.Any, Seq(someBox)).count())

    // beyond-parity analytics over the PARQUET warehouse (not the cached
    // fixture): clusters cover every script, ledger ties to the live UTXO,
    // flows and the hot-script sketch return non-trivial results
    val clusters = engine.addressClusters
    assert(clusters.count() ==
      engine.tables.outputs.select("ergoTreeHash").distinct().count())
    val lastBal = engine.balanceHistory.groupBy("ergoTreeHash")
      .agg(max_by(col("balance"), col("height")).as("b"))
      .agg(sum("b")).head.getLong(0)
    val liveTotal = engine.utxos.agg(sum("ergValue")).head.getLong(0)
    assert(lastBal == liveTotal, "ledger tips must sum to the live UTXO value")
    assert(engine.richListAt(n, 5).count() == 5)
    assert(engine.flows(dust = 1000000L).count() > 0)
    assert(engine.hotScripts(8).count() >= 1)
    assert(engine.tokenHolders().count() > 0)

    // BlockService lookups: by one id, by an id set, miss → empty
    val tipRow = engine.lastBlocks(2).select("blockId").collect().map(_.getString(0))
    assert(engine.blockById(tipRow.head).count() == 1)
    assert(engine.blocksByIds(tipRow.toSeq).count() == 2)
    assert(engine.blockById("no-such-block").count() == 0)

    // velocity + age analytics over the warehouse
    assert(engine.coinBlocksDestroyed.agg(sum("nSpends")).head.getLong(0) ==
      engine.tables.inputs.count(), "every spend is aged exactly once")
    val ageBoxes = engine.utxoAgeDistribution().agg(sum("nBoxes")).head.getLong(0)
    assert(ageBoxes == engine.utxos.count(), "age buckets partition the UTXO set")

    // PageRank is a probability distribution over every script
    val prSum = engine.scriptPageRank().agg(sum("pagerank")).head.getDouble(0)
    assert(math.abs(prSum - 1.0) < 1e-3, s"pagerank mass $prSum must be ~1")
  }

  test("persistent catalog: a SECOND session queries warehouse and corpus by name") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-catalog").toString
    val engine = new GraftEngine(spark, s"$base/warehouse")
    engine.ingest.processBatch(
      spark.createDataset(ChainFixture.generate(30)), 0L)
    engine.registerCatalog(prefix = "cat_")
    queries.CorpusSurface.mountCatalog(spark, sf0001, prefix = "ccat_")

    // a FRESH session (no temp views, no Scala mounts, no memos) — the
    // catalog alone must resolve every table/view by name
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists("cat_blocks"))
    // external entity table == facade
    assert(s2.sql("SELECT count(*) FROM cat_blocks").head.getLong(0) ==
      engine.tables.blocks.count())
    // catalog VIEW over external tables (always fresh)
    assert(s2.sql("SELECT count(*) FROM cat_utxo_live").head.getLong(0) ==
      engine.utxos.count())
    // the MVCC pin as a catalog view over the manifest == the Scala frame,
    // value-for-value (hash of the sorted box set, not just the count)
    val viaSql = s2.sql(
      "SELECT boxId, ergValue FROM cat_utxo ORDER BY boxId")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val viaScala = engine.utxos.select("boxId", "ergValue").orderBy("boxId")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql == viaScala)
    // snapshot dims
    assert(s2.sql("SELECT count(*) FROM cat_ergo_trees").head.getLong(0) ==
      engine.tables.ergoTrees.count())
    assert(s2.sql("SELECT count(*) FROM cat_tx_edges").head.getLong(0) ==
      engine.txEdges.count())

    // corpus twin: the snapshot verdict tables equal the batch operators
    val cleanSql = s2.sql(
      "SELECT doc_id, keep, reason FROM ccat_clean ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    val cleanScala = SparkEntry.queries("q108_clean_export")(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("keep"), r.getAs[String]("reason"))).toSeq
    assert(cleanSql == cleanScala)
    assert(s2.sql("SELECT count(*) FROM ccat_documents").head.getLong(0) ==
      Tables.load(spark, sf0001, "documents").count())
    // the pin advances on re-registration after further ingest
    engine.ingest.processBatch(
      spark.createDataset(ChainFixture.generate(40).drop(30)), 1L)
    engine.registerCatalog(prefix = "cat_")
    assert(s2.sql("SELECT count(*) FROM cat_blocks").head.getLong(0) == 40L)
    assert(s2.sql("SELECT count(*) FROM cat_utxo").head.getLong(0) ==
      engine.utxos.count())
  }

  test("catalog staleness stamp: refresh only when the warehouse advanced, snapshots GC'd") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-catalog-stale").toString
    val engine = new GraftEngine(spark, s"$base/warehouse")
    val all = ChainFixture.generate(30)
    engine.ingest.processBatch(spark.createDataset(all.take(20)), 0L)
    engine.registerCatalog(prefix = "scat_")
    val v0 = engine.catalogVersion("scat_")
    assert(v0.isDefined, "registered catalog must carry the version stamp")
    assert(!engine.refreshCatalog("scat_"),
      "refresh at an unchanged warehouse version must be a no-op")
    // further ingest: the STAMP exposes the staleness before any refresh
    engine.ingest.processBatch(spark.createDataset(all.drop(20)), 1L)
    assert(engine.catalogVersion("scat_") == v0,
      "pinned views must keep their registration-time stamp")
    assert(engine.ingest.currentUtxoVersion().exists(c => !v0.contains(c)),
      "warehouse version must have advanced past the stamp")
    val stale = spark.sql("SELECT count(*) FROM scat_ergo_trees").head.getLong(0)
    assert(engine.refreshCatalog("scat_"),
      "refresh at an advanced warehouse version must re-register")
    assert(engine.catalogVersion("scat_")
      .zip(v0).exists { case (a, b) => a > b })
    // refreshed snapshot equals a fresh derivation, value-for-value
    val viaSql = spark.sql("SELECT hash FROM scat_ergo_trees ORDER BY hash")
      .collect().map(_.getString(0)).toSeq
    val viaScala = engine.tables.ergoTrees.select("hash").orderBy("hash")
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaScala)
    assert(viaSql.size >= stale, "the refresh must see the new ingest")
    assert(!engine.refreshCatalog("scat_"), "second refresh must be a no-op")
    // versioned snapshot GC: current + one previous dir retained, no more
    engine.ingest.processBatch(
      spark.createDataset(ChainFixture.generate(35).drop(30)), 2L)
    assert(engine.refreshCatalog("scat_"))
    // r10: roots are prefix-scoped — two prefixes never share a v= chain
    val vs = new java.io.File(s"$base/warehouse/_catalog/scat_ergo_trees")
      .list().toSeq.filter(_.startsWith("v=")).sorted
    assert(vs.size == 2, s"expected current+previous snapshot dirs, got $vs")
  }

  test("catalog registration survives an ingest commit landing mid-registration") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-catalog-race").toString
    val engine = new GraftEngine(spark, s"$base/warehouse")
    val all = ChainFixture.generate(40)
    engine.ingest.processBatch(spark.createDataset(all.take(20)), 0L)

    // scenario 1: ONE commit lands between the version pre-read and the
    // snapshot writes — registration must detect the advance and re-run
    // the pass, so the stamp matches the (post-commit) snapshot content
    // and refreshCatalog sees a FRESH catalog, not an undetectably stale
    // one (r09 VERDICT #5: a stamp read before materialization made the
    // stamp an UPPER bound; refreshCatalog then refused to refresh until
    // the commit after next).
    var fired = false
    engine.midRegistrationHook = () => if (!fired) {
      fired = true
      engine.ingest.processBatch(spark.createDataset(all.slice(20, 30)), 1L)
    }
    engine.registerCatalog(prefix = "rcat_")
    engine.midRegistrationHook = () => ()
    assert(fired, "the race hook must have interleaved a commit")
    assert(engine.catalogVersion("rcat_") == engine.ingest.currentUtxoVersion(),
      "stamp must match the warehouse version the snapshots were built at")
    assert(!engine.refreshCatalog("rcat_"),
      "registration re-ran against the interleaved commit — nothing stale")
    // the snapshots really contain the mid-registration commit's data
    assert(spark.sql("SELECT count(*) FROM rcat_ergo_trees").head.getLong(0) ==
      engine.tables.ergoTrees.count())

    // scenario 2: a commit lands on EVERY pass (continuous ingest) — the
    // bounded retry bails with its pre-read stamp, a LOWER bound on the
    // snapshot content, so refreshCatalog still DETECTS the staleness
    // (one redundant refresh, never an undetected stale catalog).
    var batch = 2L
    var from = 30
    engine.midRegistrationHook = () => if (from < 40) {
      engine.ingest.processBatch(
        spark.createDataset(all.slice(from, from + 3)), batch)
      from += 3; batch += 1
    }
    engine.registerCatalog(prefix = "rcat_")
    engine.midRegistrationHook = () => ()
    assert(engine.refreshCatalog("rcat_"),
      "a lower-bound stamp must still surface as refreshable staleness")
    assert(!engine.refreshCatalog("rcat_"))
  }

  test("heal detects a crash between raw append and derivation and repairs it") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-heal").toString
    val engine = new GraftEngine(spark, s"$base/warehouse")
    val all = ChainFixture.generate(30)
    engine.ingest.processBatch(spark.createDataset(all.take(20)), 0L)
    assert(!engine.heal(), "consistent state must not trigger healing")

    // simulate the crash: raw gets the last 10 blocks, entities don't
    spark.createDataset(all.drop(20)).toDF()
      .write.mode("append").parquet(s"$base/warehouse/raw")
    assert(engine.heal(), "raw ahead of tables must trigger healing")

    val blocks = engine.ingest.blocks(spark)
    assert(blocks.count() == 30)
    val expected = UtxoQueries.utxos(
      BlockDerivation.derive(spark.createDataset(all)))
      .select("boxId").collect().map(_.getString(0)).toSet
    val got = engine.utxos.select("boxId").collect().map(_.getString(0)).toSet
    assert(got == expected)
  }

  test("claimVersion: atomic-rename arbiter — winner claims, loser adopts") {
    // r10 ADVICE: two APPLICATIONS sharing one snapshot root race past
    // JVM-local locks; the v= claim must be an atomic rename. This pins the
    // arbiter's mechanics directly (an in-process race cannot reach the
    // window — the per-root lock serializes it).
    val hconf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(
      Files.createTempDirectory("graft-claim").toString)
    val fs = root.getFileSystem(hconf)

    def writeDir(p: org.apache.hadoop.fs.Path, marker: String): Unit = {
      fs.mkdirs(p)
      val out = fs.create(new org.apache.hadoop.fs.Path(p, marker), true)
      try out.write(1) finally out.close()
    }

    // winner path: temp renames into v=0, temp gone, content carried over
    val tmp1 = new org.apache.hadoop.fs.Path(root, ".tmp-a")
    writeDir(tmp1, "mine.parquet")
    val (p1, won1) = GraftEngine.claimVersion(fs, root, tmp1, 0L)
    assert(won1 && p1.getName == "v=0")
    assert(!fs.exists(tmp1))
    assert(fs.exists(new org.apache.hadoop.fs.Path(p1, "mine.parquet")))

    // loser path: v=1 already exists (the other application won) — our
    // temp is dropped wherever it landed, the WINNER's dir is adopted and
    // its bytes are untouched
    val winner = new org.apache.hadoop.fs.Path(root, "v=1")
    writeDir(winner, "theirs.parquet")
    val tmp2 = new org.apache.hadoop.fs.Path(root, ".tmp-b")
    writeDir(tmp2, "mine2.parquet")
    val (p2, won2) = GraftEngine.claimVersion(fs, root, tmp2, 1L)
    assert(!won2 && p2.getName == "v=1")
    assert(!fs.exists(tmp2), "the loser's temp must be cleaned up")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(winner, ".tmp-b")),
      "a nested rename-into-existing-dir must be cleaned up")
    assert(fs.exists(new org.apache.hadoop.fs.Path(winner, "theirs.parquet")),
      "the winner's snapshot must be untouched")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(winner, "mine2.parquet")))
  }
}
