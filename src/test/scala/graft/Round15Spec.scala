package graft

import graft.queries.{BandSkewReport, DedupQueries, DiversitySketches, TextQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural laws of the round-15 operators: the ingest-time diversity
  * sketch tier (union losslessness, stream==batch, error vs the exact
  * census, plan shape of the timed merge), the persisted band-skew
  * report, the broadcast-scored NB classifier's plan shape, and the q26
  * stripe law.
  */
class Round15Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  // ---- diversity sketch tier (r14 verdict item 1) ----

  test("q169: sketch-union merge tracks a single-pass sketch within the " +
    "sketch RSE, totals exact, and sits within HLL error of exact q156") {
    val viaTable = q("q169_diversity_sketch").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // single-pass Datasketches sketch over the same gram stream: the
    // union result drops the HIP estimator (inherent to mergeability),
    // so the pin is within the sketch's own RSE, with exact totals
    val direct = TextQueries.sketchGrams(spark, sf001)
      .groupBy("source", "n")
      .agg(count(lit(1)).as("t"),
        hll_sketch_estimate(
          hll_sketch_agg(col("gh"), lit(DiversitySketches.LgK))).as("d"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(viaTable.keySet == direct.keySet)
    viaTable.foreach { case (k, (tot, dst)) =>
      val (dt, dd) = direct(k)
      assert(tot == dt, s"$k: totals must be exact ($tot vs $dt)")
      assert(math.abs(dst - dd).toDouble / dd <= 0.05,
        s"$k: table-merged $dst vs single-pass $dd beyond sketch RSE")
    }
    // and the estimates track the exact census (q156 stays the oracle
    // companion; the sketch tier answers the same question from the
    // warehouse)
    val exact = q("q156_ngram_diversity").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(exact.keySet == viaTable.keySet)
    exact.foreach { case (k, (etot, edst)) =>
      val (tot, dst) = viaTable(k)
      assert(tot == etot, s"$k: sketch-tier total $tot vs exact $etot")
      assert(math.abs(dst - edst).toDouble / edst <= 0.10,
        s"$k: estimate $dst vs exact $edst beyond HLL tolerance")
    }
  }

  test("q169 plan: the timed merge reads ONLY the sketch table — no " +
    "document scan, no gram-mass shuffle") {
    val plan = q("q169_diversity_sketch")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"sketch merge must not rescan the corpus:\n$plan")
    assert(plan.contains("_graft_diversity_sketches"),
      "merge must read the published sketch table")
    assert("hashpartitioning\\([^)]*gh#".r.findFirstIn(plan).isEmpty,
      "no gram key may cross an exchange in the sketch merge")
  }

  test("sketch rows: ANY partition of the corpus union-merges to the " +
    "batch answer (the micro-batch append law), via a real stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDiversitySketch
    import graft.streaming.StreamingDiversitySketch.Doc
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id").as("docId"), col("source"), col("text"))
      .as[Doc].collect().toSeq
    val out = java.nio.file.Files.createTempDirectory("graft-dsk-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsk-ck").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    // three arbitrary, UNEVEN batches — bucket boundaries deliberately
    // split across micro-batches so partial sketch rows genuinely occur
    val qy = StreamingDiversitySketch.start(ms.toDS(), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    try {
      ms.addData(docs.take(100))
      qy.processAllAvailable()
      ms.addData(docs.slice(100, 150))
      qy.processAllAvailable()
      ms.addData(docs.drop(150))
      qy.processAllAvailable()
    } finally qy.stop()
    val rows = StreamingDiversitySketch.sketches(spark, out)
    val streamed = DiversitySketches.merged(rows).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val batch = q("q169_diversity_sketch").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(streamed.map(_._1).toSeq == batch.map(_._1).toSeq)
    streamed.zip(batch).foreach { case ((k, (st, sd)), (_, (bt, bd))) =>
      assert(st == bt, s"$k: split-bucket totals must be exact ($st vs $bt)")
      assert(math.abs(sd - bd).toDouble / bd <= 0.05,
        s"$k: split-bucket estimate $sd vs batch $bd beyond sketch RSE")
    }
    // order-independence: the merged state is a pure function of the SET
    // of sketch rows — re-merging the same rows moves nothing
    val again = DiversitySketches.merged(rows).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(again.toSeq == streamed.toSeq, "union must be order-independent")

    // ALIGNED law: a bucket wholly owned by one micro-batch appends the
    // byte-identical sketch row the batch materializer writes (sf0.01 is
    // one bucket, so one batch == alignment)
    val out2 = java.nio.file.Files.createTempDirectory("graft-dsk-al").toString
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-dsk-alck").toString
    val ms2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val qy2 = StreamingDiversitySketch.start(ms2.toDS(), out2, ckpt2,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    try { ms2.addData(docs); qy2.processAllAvailable() } finally qy2.stop()
    def bytesOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("bucket"), r.getAs[String]("source"),
        r.getAs[Long]("n")), (r.getAs[Long]("total_grams"),
        r.getAs[Array[Byte]]("sketch").toSeq))).toMap
    val alignedRows = bytesOf(StreamingDiversitySketch.sketches(spark, out2))
    val batchRows = bytesOf(
      spark.read.parquet(DiversitySketches.table(spark, sf001)))
    assert(alignedRows == batchRows,
      "aligned stream must append byte-identical sketch rows")
  }

  test("sketch materializer keeps two prior versions and GCs the rest") {
    val out = java.nio.file.Files.createTempDirectory("graft-dsk-gc").toString
    // keep window newest−2 (r15 ADVICE: one-version grace raced table()'s
    // exists() check against a concurrent re-materializer's GC; a reader
    // now survives TWO full materialize cycles before its version vanishes)
    (1 to 4).foreach(_ => DiversitySketches.materialize(spark, sf0001, out))
    val vs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("v=")).sorted.toSeq
    assert(vs == Seq("v=1", "v=2", "v=3"),
      s"exactly the newest and two prior versions must remain, got $vs")
  }

  // ---- persisted band-skew report (r14 verdict item 5) ----

  test("band-skew report persists on the maintenance cadence and mounts " +
    "as a SQL view") {
    val out = java.nio.file.Files.createTempDirectory("graft-bsr").toString
    // cadence law: batch 0 writes, off-cadence batches don't
    assert(BandSkewReport.maintainEvery(spark, sf001, out, 0L, 3L).contains(0L))
    assert(BandSkewReport.maintainEvery(spark, sf001, out, 1L, 3L).isEmpty)
    assert(BandSkewReport.maintainEvery(spark, sf001, out, 3L, 3L).contains(1L))
    val runs = BandSkewReport.runs(spark, out)
    val rows = runs.collect()
    assert(rows.nonEmpty)
    val nDocs = spark.read.parquet(s"$sf001/documents.parquet").count()
    val auto = DedupQueries.bandShardBits(nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Int]("adaptive_bits") == auto)
      assert(Seq(0, auto).contains(r.getAs[Int]("bits")))
      val (nb, mx, pm) = (r.getAs[Long]("n_buckets"),
        r.getAs[Long]("max_occ"), r.getAs[Long]("pair_mass"))
      assert(nb > 0 && mx >= 1 && pm >= 0)
      // integer pair-mass exactness floor: a bucket of occ=max contributes
      // max·(max−1)/2, so pair_mass ≥ that single bucket's term
      assert(pm >= mx * (mx - 1) / 2)
    }
    // at-least-once REPLAY of a maintenance batch overwrites its own run
    // dir (run id = batchId/cadence, a pure function of the batch) —
    // never appends a duplicate that would double-count the counters
    assert(BandSkewReport.maintainEvery(spark, sf001, out, 0L, 3L).contains(0L))
    assert(BandSkewReport.runs(spark, out).count() == rows.length.toLong,
      "replayed maintenance batch must not append a duplicate run")
    // two cadence hits → two run dirs, both readable through the view
    graft.queries.CorpusSurface.mountStreams(spark, "r15bsr_",
      bandAuditDir = Some(out))
    val viaSql = spark.sql(
      "SELECT count(DISTINCT bits), count(*) FROM r15bsr_band_audit").head()
    assert(viaSql.getLong(1) == rows.length.toLong)
  }

  test("corpus-build route drives the band-skew maintenance sidecar") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCorpusBuild
    import graft.streaming.StreamingCorpusBuild.{Maintenance, SplitDoc}
    val docs = (0L until 6L).map(i =>
      SplitDoc(i, "s0", "en", "train", s"alpha beta gamma delta tok$i"))
    val out = java.nio.file.Files.createTempDirectory("graft-scbm").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scbm-ck").toString
    val audit = java.nio.file.Files.createTempDirectory("graft-scbm-au").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SplitDoc]
    val qy = StreamingCorpusBuild.route(ms.toDS(), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50),
      maintenance = Some(Maintenance(sf001, audit, 2L)))
    try {
      ms.addData(docs.take(3)); qy.processAllAvailable() // batch 0: writes
      ms.addData(docs.drop(3)); qy.processAllAvailable() // batch 1: skips
    } finally qy.stop()
    val runDirs = new java.io.File(audit).listFiles()
      .map(_.getName).filter(_.startsWith("run=")).toSeq
    assert(runDirs == Seq("run=0"),
      s"cadence-2 over two batches must persist exactly run=0, got $runDirs")
    assert(BandSkewReport.runs(spark, audit).count() > 0)
  }

  test("mountStreams exposes streaming sketch rows for plain-SQL merge") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-dsk2").toString
    // one "micro-batch" written through the batch kernel (the appender's
    // per-batch write shape)
    graft.streaming.StreamingDiversitySketch.sketchBatch(
      spark.read.parquet(s"$sf001/documents.parquet")
        .select(col("doc_id").as("docId"), col("source"), col("text")))
      .write.mode("overwrite").parquet(s"$out/batch=0")
    graft.queries.CorpusSurface.mountStreams(spark, "r15dsk_",
      sketchesDir = Some(out))
    val merged = spark.sql(
      """SELECT source, n, sum(total_grams) AS t,
         hll_sketch_estimate(hll_union_agg(sketch)) AS d
         FROM r15dsk_diversity_sketches GROUP BY source, n""").collect()
    val expect = q("q169_diversity_sketch").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    merged.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert((r.getLong(2), r.getLong(3)) == expect(k), s"$k")
    }
  }

  // ---- image perceptual-hash near-dup (r14 verdict item 2) ----

  test("dHash on REAL PNG bytes: brightness-invariant for a shifted copy, " +
    "far for unrelated images") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = { val c = math.max(0, math.min(255, v)); (c << 16) | (c << 8) | c }
    // a deterministic gradient-textured image, its globally-brightened
    // copy (every luma +25: all < relations preserved), and an unrelated
    // texture
    val base = png((x, y) => gray(40 + ((x * 7 + y * 13) % 160)))
    val brighter = png((x, y) => gray(65 + ((x * 7 + y * 13) % 160)))
    val other = png((x, y) => gray(200 - ((x * 11 + y * 3) % 180)))
    val (hb, hs, ho) = (graft.multimodal.MediaFunctions.dHash(base),
      graft.multimodal.MediaFunctions.dHash(brighter),
      graft.multimodal.MediaFunctions.dHash(other))
    assert(java.lang.Long.bitCount(hb ^ hs) <= 2,
      s"global brightness shift must barely move the dHash " +
        s"(got ${java.lang.Long.bitCount(hb ^ hs)})")
    assert(java.lang.Long.bitCount(hb ^ ho) > 7,
      s"unrelated textures must not pair " +
        s"(got ${java.lang.Long.bitCount(hb ^ ho)})")
  }

  test("streaming image near-dup emits exactly batch q170's pairs, " +
    "across arbitrary micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingMediaNearDup
    val rows = graft.multimodal.MediaFixture.generatePhash(
      spark, graft.queries.MultimodalQueries.PhashRows).collect().toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      graft.multimodal.MediaRow]
    val pairs = StreamingMediaNearDup.pairs(ms.toDS(),
      graft.queries.MultimodalQueries.PhashMaxHamming)
    val qy = pairs.writeStream.format("memory").queryName("r15phash")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ph-ck").toString)
      .start()
    try {
      // family members deliberately split across batches: head in batch 1,
      // its near-dups in batches 2 and 3 — pairing must cross boundaries
      ms.addData(rows.filter(_.mediaId % 3 == 0))
      qy.processAllAvailable()
      ms.addData(rows.filter(_.mediaId % 3 == 1))
      qy.processAllAvailable()
      ms.addData(rows.filter(_.mediaId % 3 == 2))
      qy.processAllAvailable()
    } finally qy.stop()
    val streamed = spark.sql(
      "SELECT DISTINCT aId, bId, hamming FROM r15phash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = q("q170_image_phash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch,
      s"stream/batch pair sets must be identical " +
        s"(stream-only: ${streamed -- batch}, batch-only: ${batch -- streamed})")
    // a threshold the 8-block pigeonhole cannot guarantee must fail
    // loudly, never silently drop recall
    intercept[IllegalArgumentException] {
      StreamingMediaNearDup.pairs(ms.toDS(), StreamingMediaNearDup.NumBlocks)
    }
  }

  // ---- q102 broadcast scoring (r14 verdict item 4) ----

  test("q102: scoring is narrow — no window, no doc-extent exchange on " +
    "the score side") {
    val plan = q("q102_nb_classifier").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"argmax must be an in-row array sort, not a window:\n$plan")
    // the only exchanges allowed are the seed-side model aggs (keyed by
    // lang/b — type-level) and the final presentation sort; the non-seed
    // token mass must never be hash-partitioned by doc_id
    assert("hashpartitioning\\(doc_id".r.findFirstIn(plan).isEmpty,
      s"non-seed scoring must not shuffle on doc_id:\n$plan")
  }

  test("corpus surface publishes the sketch-tier diversity rollup") {
    graft.queries.CorpusSurface.mount(spark, sf001, "r15div_")
    val viaSql = spark.sql(
      "SELECT source, n, total_grams, distinct_grams FROM r15div_diversity")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    val direct = q("q169_diversity_sketch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    assert(viaSql == direct)
  }

  // ---- the zipf correctness gate cannot rot (r14 verdict item 3) ----

  test("ZipfGate: every pinned query exists and is oracle-bound") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    ZipfGate.Queries.foreach { n =>
      assert(qs.contains(n), s"$n vanished from SparkEntry.queries")
      assert(os.contains(n), s"$n lost its DuckDB oracle — the zipf " +
        "artifact would silently degrade to rows-only")
    }
    assert(ZipfGate.Queries.distinct.size == ZipfGate.Queries.size)
    assert(ZipfGate.Queries.size >= 26, "the gate list must not narrow")
  }

  // ---- q26 stripe law (r14 verdict item 6) ----

  test("q26/q120: census population is pinned to the stripe — docs at or " +
    "beyond CensusStripeMax never enter pairs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q26s").toString
    // two identical docs inside the stripe (one qualifying pair) and two
    // identical docs beyond it (would pair if the stripe leaked)
    val mk = (id: Long, t: String) => (id, t, "en", "s0", t.length.toLong)
    val txtA = (1 to 12).map(i => s"tok$i").mkString(" ")
    val txtB = (1 to 12).map(i => s"other$i").mkString(" ")
    Seq(mk(1L, txtA), mk(2L, txtA),
      mk(DedupQueries.CensusStripeMax + 1, txtB),
      mk(DedupQueries.CensusStripeMax + 2, txtB))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("q26_shingle_jaccard")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)),
      s"stripe must keep exactly the in-stripe pair, got ${pairs.toSeq}")
    // identical docs are mutual 100% containers — both directed pairs
    // inside the stripe, none across/beyond it (q120 rides the same law)
    val cont = SparkEntry.queries("q120_containment")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cont.toSeq == Seq((1L, 2L), (2L, 1L)),
      s"q120 stripe must keep exactly the in-stripe pairs, got ${cont.toSeq}")
  }
}
