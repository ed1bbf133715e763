package graft

import graft.queries.SimilarityQueries
import graft.streaming.StreamingMediaRoute
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Structural laws of the round-18 changes: the media store's bounded-
  * listing fold (compaction watermark committed atomically with the
  * rewritten data; replay and crash recovery preserved across it), and
  * the staged-vs-exact pair tail's self-selection from persisted audit
  * evidence.
  */
class Round18Spec extends AnyFunSuite {
  import TestSpark._

  // ---- media-route fold (r17 verdict item 1) ----

  private def mediaBatches(): Seq[Seq[graft.multimodal.MediaRow]] = {
    val fix = graft.multimodal.MediaFixture
      .generatePhash(spark, 40).collect().toSeq
    def grft(id: Long, f: Int => Int): graft.multimodal.MediaRow = {
      val b = java.nio.ByteBuffer.allocate(13 + 72)
      b.put("GRFT".getBytes("US-ASCII")); b.put(1.toByte)
      b.putInt(64); b.putInt(48)
      (0 until 72).foreach(i => b.put((f(i) & 0xff).toByte))
      graft.multimodal.MediaRow(id, "image", b.array(),
        graft.multimodal.MediaMeta("x-graft/image", 64, 48, -1, -1))
    }
    val flats = Seq(grft(900L, _ => 77), grft(901L, _ => 77))
    Seq(fix.take(14) ++ flats, fix.slice(14, 28), fix.drop(28))
  }

  private def runBatches(root: String, cadence: Long,
    batches: Seq[Seq[graft.multimodal.MediaRow]], startId: Long = 0L): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingMediaRoute.processBatch(spark.createDataset(b).toDF(),
        startId + i, root, maxHamming = 7, auditCadence = 0,
        compactCadence = cadence)
    }
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def batchDirs(base: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(base)
    val ls = Files.list(p)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("batch=")).toSeq.sorted
    finally ls.close()
  }

  test("media-store fold: pair ledger and phash store are row-identical " +
    "across a compaction, listing is bounded by the cadence, and a " +
    "replayed batch after compaction leaves both stores unchanged") {
    import spark.implicits._
    val batches = mediaBatches()
    val folded = Files.createTempDirectory("graft-mfold").toString
    val plain = Files.createTempDirectory("graft-mplain").toString
    runBatches(folded, cadence = 2, batches)
    runBatches(plain, cadence = 0, batches)
    // row-identical accumulated views (batch_id column included)
    assert(rowsOf(StreamingMediaRoute.phashes(spark, folded)) ==
      rowsOf(StreamingMediaRoute.phashes(spark, plain)))
    assert(rowsOf(StreamingMediaRoute.pairs(spark, folded)) ==
      rowsOf(StreamingMediaRoute.pairs(spark, plain)))
    assert(StreamingMediaRoute.pairs(spark, folded).count() > 0,
      "the fixture must contain near-dup families")
    // fold ran after batch 1: batches 0..1 live ONLY in store generations;
    // the unfolded tail is batch 2 alone — O(cadence) listing
    Seq("phash", "pairs").foreach { t =>
      assert(Files.exists(Paths.get(s"$folded/$t/store")),
        s"$t store generation missing")
      assert(batchDirs(s"$folded/$t") == Seq("batch=2"),
        s"$t tail should hold only the unfolded batch")
      val wm = Files.readString(
        Paths.get(s"$folded/$t/store/${StreamingMediaRoute.WatermarkFile}"))
      assert(wm.trim.toLong == 1L)
    }
    // replay of an ALREADY-FOLDED batch (id=1): recomputes its original
    // pairs into an ignored dir; accumulated views unchanged, no dupes
    val phBefore = rowsOf(StreamingMediaRoute.phashes(spark, folded))
    val prBefore = rowsOf(StreamingMediaRoute.pairs(spark, folded))
    StreamingMediaRoute.processBatch(
      spark.createDataset(batches(1)).toDF(), 1L,
      folded, maxHamming = 7, auditCadence = 0, compactCadence = 2)
    assert(rowsOf(StreamingMediaRoute.phashes(spark, folded)) == phBefore)
    assert(rowsOf(StreamingMediaRoute.pairs(spark, folded)) == prBefore)
    // the fold after the replayed batch garbage-collects the stale dir
    // (replay id=1 → (1+1) % 2 == 0 → fold runs, nothing new to fold)
    assert(batchDirs(s"$folded/phash") == Seq("batch=2"))
    // replay of the UNFOLDED tail batch (id=2) is plain overwrite-idempotence
    StreamingMediaRoute.processBatch(
      spark.createDataset(batches(2)).toDF(), 2L,
      folded, maxHamming = 7, auditCadence = 0, compactCadence = 2)
    assert(rowsOf(StreamingMediaRoute.pairs(spark, folded)) == prBefore)
  }

  test("media-store fold: a crash between the swap renames (store dir " +
    "missing, complete tmp present) is repaired by the next batch and " +
    "loses nothing") {
    import spark.implicits._
    val batches = mediaBatches()
    val root = Files.createTempDirectory("graft-mcrash").toString
    val plain = Files.createTempDirectory("graft-mcrash-plain").toString
    runBatches(root, cadence = 2, batches.take(2))
    runBatches(plain, cadence = 0, batches.take(2))
    // simulate the crash window: dir moved aside, tmp fully written —
    // exactly the state between swapIn's two renames
    Seq("phash", "pairs").foreach { t =>
      Files.move(Paths.get(s"$root/$t/store"),
        Paths.get(s"$root/$t/store.compact-tmp"))
    }
    runBatches(root, cadence = 2, batches.drop(2), startId = 2L) // recovers, then batch 2
    StreamingMediaRoute.processBatch(
      spark.createDataset(batches(2)).toDF(), 2L,
      plain, maxHamming = 7, auditCadence = 0, compactCadence = 0)
    assert(rowsOf(StreamingMediaRoute.phashes(spark, root)) ==
      rowsOf(StreamingMediaRoute.phashes(spark, plain)))
    assert(rowsOf(StreamingMediaRoute.pairs(spark, root)) ==
      rowsOf(StreamingMediaRoute.pairs(spark, plain)))
  }

  test("route() end-to-end with compaction: streamed pair union still " +
    "equals the batch q170 kernel and the final listing is store-only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batches = mediaBatches()
    val root = Files.createTempDirectory("graft-mroute18").toString
    val ck = Files.createTempDirectory("graft-mroute18-ck").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.multimodal.MediaRow]
    val qy = StreamingMediaRoute.route(ms.toDS(), root, ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50),
      auditCadence = 1L, compactCadence = 1L)
    try batches.foreach { b => ms.addData(b); qy.processAllAvailable() }
    finally qy.stop()
    val streamed = StreamingMediaRoute.pairs(spark, root)
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = batches.flatten
    val ph = graft.multimodal.MediaFunctions.perceptualHash(
      spark.createDataset(all)).toDF()
      .filter(col("phash") =!= 0L && col("phash") =!= -1L)
    val keyed = ph.select(col("mediaId"), col("phash"),
      posexplode(array((0 until 8).map(b =>
        shiftright(col("phash"), b * 8).bitwiseAND(lit(0xffL))): _*))
        .as(Seq("blk", "bk")))
    val batch = keyed.as("a").join(keyed.as("b"),
      col("a.blk") === col("b.blk") && col("a.bk") === col("b.bk") &&
        col("a.mediaId") < col("b.mediaId"))
      .select(col("a.mediaId").as("a_id"), col("b.mediaId").as("b_id"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("h"))
      .filter(col("h") <= 7).select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"only-streamed=${streamed -- batch} only-batch=${batch -- streamed}")
    assert(batch.nonEmpty)
    Seq("phash", "pairs").foreach { t =>
      assert(batchDirs(s"$root/$t").isEmpty,
        s"cadence-1 fold must leave zero unfolded $t batch dirs")
    }
    // the audit cadence keeps running across folds
    assert(graft.queries.BandSkewReport.runs(spark, s"$root/phash_audit")
      .filter(col("run_id") === 2L).count() > 0)
  }

  // ---- staged-tail self-selection (r17 verdict item 2) ----

  private def writeEmbeddings(vecs: Seq[Array[Float]]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-annsel").toString
    vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, (i % 4).toLong, v) }
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("stagedFromAudit reads the LATEST persisted run and applies the " +
    "survivor-fraction cutover; no evidence means the exact default") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-annaud").toString
    assert(!SimilarityQueries.stagedFromAudit(spark, dir))
    assert(!SimilarityQueries.stagedFromAudit(spark, s"$dir/never-written"))
    def put(runId: Long, c: Long, s: Long): Unit =
      Seq((runId, c, s, 0.4)).toDF("run_id", "candidate_mass",
        "survivor_mass", "tau")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/run=$runId")
    put(0L, 1000000L, 50L)      // S/C = 5e-5 → staged
    assert(SimilarityQueries.stagedFromAudit(spark, dir))
    put(1L, 1000000L, 500000L)  // latest run outranks: S/C = 0.5 → exact
    assert(!SimilarityQueries.stagedFromAudit(spark, dir))
    put(2L, 1000000L,
      (SimilarityQueries.AnnTailSurvivorFrac * 1000000L).toLong) // boundary: ≤ picks staged
    assert(SimilarityQueries.stagedFromAudit(spark, dir))
    put(3L, 0L, 0L)             // degenerate corpus → exact (no division)
    assert(!SimilarityQueries.stagedFromAudit(spark, dir))
  }

  test("a high-tau-shaped corpus (sparse survivors) measurably takes the " +
    "staged branch, a near-dup-saturated one keeps the exact kernel, and " +
    "both branches stay bit-identical") {
    val rnd = new scala.util.Random(1808)
    // near-orthogonal 256-dim gaussians: pairwise cosine concentrates at
    // σ = 1/16, so the certified bound at tau 0.4 admits essentially
    // nothing — the q140-like regime where staged wins
    val sparse = writeEmbeddings(
      Seq.fill(600)(Array.fill(256)(rnd.nextGaussian().toFloat)))
    // one base vector plus small jitter: every within-cluster pair passes
    // the bound — survivors ≈ candidates, the measured-reversal regime
    val base = Array.fill(64)(rnd.nextGaussian())
    val dense = writeEmbeddings(Seq.fill(300)(
      base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat)))
    val aud1 = Files.createTempDirectory("graft-annaud1").toString
    val aud2 = Files.createTempDirectory("graft-annaud2").toString
    val (c1, s1) = SimilarityQueries.annTailAudit(spark,
      SimilarityQueries.ivf2Assigned(spark, sparse), aud1)
    val (c2, s2) = SimilarityQueries.annTailAudit(spark,
      SimilarityQueries.ivf2Assigned(spark, dense), aud2)
    assert(c1 > 0 && s1.toDouble / c1 <= SimilarityQueries.AnnTailSurvivorFrac,
      s"sparse corpus should be below the cutover: S=$s1 C=$c1")
    assert(c2 > 0 && s2.toDouble / c2 > SimilarityQueries.AnnTailSurvivorFrac,
      s"dense corpus should be above the cutover: S=$s2 C=$c2")
    try {
      assert(SimilarityQueries.useAnnTailAudit(spark, aud1))
      assert(SimilarityQueries.annTailStagedChosen(spark))
      // the dial actually reroutes the tail (session-wide): run it over
      // the PAIR-RICH corpus so the bit-identity check is non-trivial
      val assigned = SimilarityQueries.ivf2Assigned(spark, dense)
      val viaDial = SimilarityQueries.ivf2Pairs(assigned)
        .collect().map(_.toString).sorted.toSeq
      SimilarityQueries.clearAnnTailAudit(spark)
      val exact = SimilarityQueries.ivf2Pairs(assigned)
        .collect().map(_.toString).sorted.toSeq
      assert(viaDial == exact && viaDial.nonEmpty)
      assert(!SimilarityQueries.useAnnTailAudit(spark, aud2))
      assert(!SimilarityQueries.annTailStagedChosen(spark))
    } finally SimilarityQueries.clearAnnTailAudit(spark)
  }

  // ---- AnnProbe: promoted from temporary diagnostic to documented tool ----

  test("AnnProbe.probe measures every stage plus both tails and persists " +
    "the tail-audit evidence") {
    val aud = Files.createTempDirectory("graft-probeaud").toString
    val (stages, counters) =
      graft.queries.AnnProbe.probe(spark, sf0001, Some(aud))
    val labels = stages.map(_.label)
    Seq("count", "coarse train", "vecProbes", "fine train", "final assign",
      "exact pair tail", "staged pair tail", "tail audit persist")
      .foreach(l => assert(labels.contains(l), s"missing stage '$l'"))
    assert(stages.forall(_.seconds >= 0.0))
    assert(counters.exists { case (c, s) => c > 0 && s >= 0 && s <= c },
      s"counters out of range: $counters")
    assert(Files.exists(Paths.get(s"$aud/run=0")),
      "probe must persist the audit run")
  }

  // ---- optimization-round pins: every restructured query must stay
  // bit-identical to its pre-r18 form (the oracle gate re-checks values
  // against DuckDB; these pins additionally hold the *engine-side* old
  // form so a regression is attributable without an oracle run) ----

  test("IndexedSumAggregator == groupBy(pos).sum over random (pos, inc) rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(18)
    val rows = (1 to 2000).map(_ =>
      (rnd.nextInt(4).toLong, rnd.nextLong(64).toLong, rnd.nextInt(7) - 3L))
    val df = rows.toDF("g", "pos", "inc")
    val agg = df.groupBy("g")
      .agg(graft.functions.IndexedSumAggregator.indexedSum(64)(
        col("pos"), col("inc")).as("vi"))
      .select(col("g"), posexplode(col("vi")).as(Seq("pos", "s")))
      .filter(col("s") =!= 0L)
    val ref = df.groupBy("g", "pos").agg(sum("inc").as("s"))
      .filter(col("s") =!= 0L)
      .select(col("g"), col("pos").cast("int").as("pos"), col("s"))
    assert(agg.exceptAll(ref).isEmpty && ref.exceptAll(agg).isEmpty,
      "indexed sum diverged from the groupBy reference")
    // out-of-range pos fails loudly, never silently drops
    val e = intercept[org.apache.spark.SparkException] {
      Seq((0L, 64L, 1L)).toDF("g", "pos", "inc").groupBy("g")
        .agg(graft.functions.IndexedSumAggregator.indexedSum(64)(
          col("pos"), col("inc"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("q139's one-exchange embedder == the pre-r18 two-exchange form") {
    val q139 = SparkEntry.queries("q139_hash_embed")(spark, sf0001)
    val old = graft.queries.TextQueries.hashEmbedCoreDecl(spark, sf0001)
      .select(col("doc_id"),
        posexplode(transform(col("vi"),
          x => round(x.cast("double") / col("nrm"), 6))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("comp"))
    assert(q139.exceptAll(old).isEmpty && old.exceptAll(q139).isEmpty,
      "q139 embedder diverged from the two-exchange reference")
  }

  test("q17's max(struct) == the pre-r18 row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val q17 = SparkEntry.queries("q17_last_per_group")(spark, sf0001)
    val w = Window.partitionBy("l_orderkey")
      .orderBy(desc("l_linenumber"), desc("l_quantity"))
    val old = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber").as("last_line"),
        round(col("l_quantity"), 2).as("qty"))
    assert(q17.exceptAll(old).isEmpty && old.exceptAll(q17).isEmpty,
      "q17 aggregate form diverged from the window reference")
  }

  test("q116's one-shuffle novelty == the pre-r18 occurrence-join form") {
    val q116 = SparkEntry.queries("q116_gram_novelty")(spark, sf0001)
    val old = graft.queries.TextQueries.gramNoveltyJoinForm(spark, sf0001)
    assert(q116.exceptAll(old).isEmpty && old.exceptAll(q116).isEmpty,
      "q116 type-table form diverged from the occurrence-join reference")
    assert(q116.count() > 0)
  }

  test("q152's collect_set pair expansion == the pre-r18 self-join form") {
    val q152 = SparkEntry.queries("q152_line_provenance")(spark, sf0001)
    val old = graft.queries.TextQueries.lineProvenanceJoinForm(spark, sf0001)
    assert(q152.exceptAll(old).isEmpty && old.exceptAll(q152).isEmpty,
      "q152 pair-expansion form diverged from the self-join reference")
    assert(q152.count() > 0)
  }

  test("q3's aggregate-below-join == the pre-r18 join-then-count form") {
    val q3 = SparkEntry.queries("q3_left_join")(spark, sf0001)
    val old = Tables.load(spark, sf0001, "orders").select("o_orderkey")
      .join(Tables.load(spark, sf0001, "lineitem").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy("o_orderkey").agg(count("l_orderkey").as("n_items"))
      .groupBy("n_items").agg(count(lit(1)).as("n_orders"))
    assert(q3.exceptAll(old).isEmpty && old.exceptAll(q3).isEmpty,
      "q3 pre-aggregated form diverged from the join-then-count reference")
  }
}
