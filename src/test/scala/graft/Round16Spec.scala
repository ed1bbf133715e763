package graft

import graft.multimodal.{MediaFunctions, MediaMeta, MediaRow}
import graft.queries.BandSkewReport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural laws of the round-16 changes: the Hamming-block skew guard
  * (degenerate-fingerprint quarantine + the persisted simhash/phash
  * occupancy tiers), the route-built diversity-sketch sidecar, the
  * ad-hoc/cadence run-id namespaces, and the full-vocabulary Zipf draw.
  */
class Round16Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  // ---- degenerate-fingerprint quarantine (r15 verdict item 1) ----

  /** A GRFT image whose 72-byte luma grid is `f(i)` — the fixture wire
    * format (13-byte header + row-major grid), built by hand so the spec
    * controls the dHash exactly.
    */
  private def grft(id: Long, f: Int => Int): MediaRow = {
    val b = java.nio.ByteBuffer.allocate(13 + 72)
    b.put("GRFT".getBytes("US-ASCII")); b.put(1.toByte)
    b.putInt(64); b.putInt(48)
    (0 until 72).foreach(i => b.put((f(i) & 0xff).toByte))
    MediaRow(id, "image", b.array(), MediaMeta("x-graft/image", 64, 48, -1, -1))
  }

  test("flat and monotone-gradient images hash to the two degenerate keys") {
    // constant luma ⇒ no gradient anywhere ⇒ all 64 bits clear
    assert(MediaFunctions.dHash(grft(0L, _ => 128).content) == 0L)
    // strictly increasing luma along every row ⇒ all 64 bits set
    assert(MediaFunctions.dHash(grft(0L, i => (i % 9) * 10).content) == -1L)
    assert(MediaFunctions.isDegenerate(0L) && MediaFunctions.isDegenerate(-1L))
    assert(!MediaFunctions.isDegenerate(1L))
  }

  test("q170's oracle row is untouched by the quarantine: the fixture has " +
    "no degenerate fingerprint") {
    val n = MediaFunctions.perceptualHash(
      graft.multimodal.MediaFixture.generatePhash(
        spark, graft.queries.MultimodalQueries.PhashRows))
      .filter(p => MediaFunctions.isDegenerate(p.phash)).count()
    assert(n == 0L, "fixture fingerprints are sha256-derived — a degenerate " +
      "hash would mean the quarantine filter changes the oracle-bound result")
  }

  test("streaming media near-dup quarantines flat images: no pairs, no " +
    "bucket state — real near-dups unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 30 flat images (every pair of them is Hamming 0 — the N² supernode)
    // plus one genuine near-dup family from the fixture
    val flats = (100L until 130L).map(i => grft(i, _ => 50))
    val fam = graft.multimodal.MediaFixture.generatePhash(spark, 3)
      .collect().toSeq
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[MediaRow]
    val qy = graft.streaming.StreamingMediaNearDup.pairs(ms.toDS())
      .writeStream.format("memory").queryName("r16quar").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-quar-ck").toString)
      .start()
    try { ms.addData(flats ++ fam); qy.processAllAvailable() } finally qy.stop()
    val pairs = spark.sql("SELECT DISTINCT aId, bId FROM r16quar").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a < 100L && b < 100L },
      s"flat images must never emit a pair, got $pairs")
    assert(pairs.nonEmpty, "the genuine near-dup family must still pair")
  }

  // ---- persisted Hamming-tier skew audit (r15 verdict item 1) ----

  test("band-skew report carries the simhash block tier alongside the " +
    "minhash bands") {
    val rows = BandSkewReport.report(spark, sf001).collect()
    val tiers = rows.map(_.getAs[String]("tier")).toSet
    // r17: the phash tier joined the oracle-bound report (corpus-scoped
    // media source, fixture fallback here)
    assert(tiers == Set("minhash", "simhash", "phash"))
    val sim = rows.filter(_.getAs[String]("tier") == "simhash")
    assert(sim.map(_.getAs[Int]("band")).sorted.toSeq == (0 until 8),
      "every 8-bit block must report a row")
    sim.foreach { r =>
      assert(r.getAs[Int]("bits") == 0)
      val (nb, mx, pm) = (r.getAs[Long]("n_buckets"),
        r.getAs[Long]("max_occ"), r.getAs[Long]("pair_mass"))
      assert(nb > 0 && nb <= 256, s"block key space is 8-bit, got $nb buckets")
      assert(pm >= mx * (mx - 1) / 2)
      assert(r.getAs[Long]("n_quarantined") >= 0L)
    }
  }

  test("phash audit: quarantined mass is counted, never folded into the " +
    "occupancy — and stays visible when it is the whole story") {
    import spark.implicits._
    // 10 flat (all-0), 5 monotone (all-1), 4 distinct honest fingerprints
    val honest = Seq(0x0123456789abcdefL, 0x0f0f0f0f0f0f0f0fL,
      0x123456789abcdef0L, 0x7777777777777777L)
    val hashes = (Seq.fill(10)(0L) ++ Seq.fill(5)(-1L) ++ honest).toDF("h64")
    val rows = BandSkewReport.phashReport(hashes).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[String]("tier") == "phash")
      assert(r.getAs[Long]("n_quarantined") == 15L)
      assert(r.getAs[Long]("n_docs") == 19L)
      // honest mass only: ≤ 4 fingerprints per block, so a block's pair
      // mass can never exceed C(4,2) — the flat supernode (C(15,2)=105
      // would dwarf it) must not leak into the counters
      assert(r.getAs[Long]("pair_mass") <= 6L)
      assert(r.getAs[Long]("max_occ") <= 4L)
    }
    // all-degenerate input: occupancy empty, quarantine still reported
    val allFlat = BandSkewReport.phashReport(Seq.fill(7)(0L).toDF("h64")).collect()
    assert(allFlat.length == 8)
    allFlat.foreach { r =>
      assert(r.getAs[Long]("n_quarantined") == 7L)
      assert(r.getAs[Long]("n_buckets") == 0L)
      assert(r.getAs[Long]("pair_mass") == 0L)
    }
  }

  test("phash audit rides the maintenance cadence with batch-derived " +
    "replay-idempotent run ids") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-phau").toString
    val hashes = (Seq.fill(3)(0L) ++ Seq(5L, 9L)).toDF("h64")
    assert(BandSkewReport.maintainPhashEvery(hashes, out, 0L, 2L).contains(0L))
    assert(BandSkewReport.maintainPhashEvery(hashes, out, 1L, 2L).isEmpty)
    assert(BandSkewReport.maintainPhashEvery(hashes, out, 2L, 2L).contains(1L))
    // replay of batch 0 overwrites run=0, never duplicates
    assert(BandSkewReport.maintainPhashEvery(hashes, out, 0L, 2L).contains(0L))
    val runs = BandSkewReport.runs(spark, out)
    assert(runs.count() == 16L, "two runs x 8 block rows")
    assert(runs.select("run_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  // ---- run-id namespaces (r15 ADVICE) ----

  test("ad-hoc band-skew runs take the negative id namespace and can " +
    "never collide with cadence runs") {
    val out = java.nio.file.Files.createTempDirectory("graft-bsrns").toString
    // a cadence run exists first
    assert(BandSkewReport.maintainEvery(spark, sf0001, out, 0L, 1L).contains(0L))
    // two ad-hoc runs: -1 then -2 — NOT max+1 (which the next cadence
    // batch would claim and silently overwrite)
    assert(BandSkewReport.persist(spark, sf0001, out) == -1L)
    assert(BandSkewReport.persist(spark, sf0001, out) == -2L)
    // the next cadence batch overwrites its OWN run, ad-hoc runs intact
    assert(BandSkewReport.maintainEvery(spark, sf0001, out, 0L, 1L).contains(0L))
    val ids = BandSkewReport.runs(spark, out).select("run_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, -1L, -2L))
    // and the mounted view can tell runs apart by the data column
    graft.queries.CorpusSurface.mountStreams(spark, "r16bsr_",
      bandAuditDir = Some(out))
    val nRuns = spark.sql(
      "SELECT count(DISTINCT run_id) FROM r16bsr_band_audit").head().getLong(0)
    assert(nRuns == 3L)
  }

  // ---- route-built diversity sketches (r15 verdict item 2) ----

  test("corpus-build route lands sketch rows as it builds: q169's answer " +
    "comes from the mounted view with no materialize call") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCorpusBuild
    import graft.streaming.StreamingCorpusBuild.SplitDoc
    val texts = Map(
      0L -> "alpha beta gamma delta epsilon",
      1L -> "alpha beta zeta eta theta",
      2L -> "iota kappa lambda mu nu",
      5L -> "alpha xi omicron pi rho")
    def doc(i: Long) = SplitDoc(i, "s0", "en", "train", texts(i))
    val out = java.nio.file.Files.createTempDirectory("graft-rsk").toString + "/c"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rsk-ck").toString
    val sk = java.nio.file.Files.createTempDirectory("graft-rsk-sk").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SplitDoc]
    val qy = StreamingCorpusBuild.route(ms.toDS(), out, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50),
      sketchOut = Some(sk))
    try {
      ms.addData(Seq(doc(0L), doc(1L), doc(2L))); qy.processAllAvailable()
      // batch 2: doc 5 is fresh; doc 1 re-arrives BEHIND the frontier —
      // late, surfaced under _late/, and must NOT be sketched twice
      ms.addData(Seq(doc(5L), doc(1L))); qy.processAllAvailable()
    } finally qy.stop()
    graft.queries.CorpusSurface.mountStreams(spark, "r16rsk_",
      sketchesDir = Some(sk))
    val merged = spark.sql(
      """SELECT source, n, sum(total_grams) AS t,
         hll_sketch_estimate(hll_union_agg(sketch)) AS d
         FROM r16rsk_diversity_sketches GROUP BY source, n""").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // exact totals: each CORPUS doc (0,1,2,5 — the late replay excluded)
    // contributes t, t-1, t-2 grams at n = 1, 2, 3
    val tokCounts = texts.values.map(_.split(" ").length)
    Seq(1, 2, 3).foreach { n =>
      assert(merged(("s0", n.toLong))._1 ==
        tokCounts.map(t => (t - n + 1).toLong).sum,
        s"n=$n total must cover the four corpus docs exactly once")
    }
    // distinct estimates: unigram types across the corpus docs (19 — tiny,
    // far under the sketch's exact-coupon regime, so the estimate is exact)
    val uniTypes = texts.values.flatMap(_.split(" ")).toSet.size.toLong
    assert(merged(("s0", 1L))._2 == uniTypes)
  }

  // ---- q140 int8 two-stage verify (r15 verdict item 4) ----

  test("int8 prefilter bound is SOUND: certified UB >= true dot for " +
    "adversarial and random vector pairs") {
    val rnd = new scala.util.Random(1607)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    def quant(v: Array[Double]): (Array[Byte], Double, Double) = {
      val ma = v.map(math.abs).max
      val sc = ma / 127.0
      // the engine quantizes with Spark round() = BigDecimal HALF_UP (away
      // from zero) — NOT math.round (half-up toward +∞), which diverges on
      // negative exact-.5 grid points (r16 ADVICE: pin the shipped rule)
      val q = v.map(x => java.math.BigDecimal.valueOf(x / sc)
        .setScale(0, java.math.RoundingMode.HALF_UP).byteValueExact())
      val er = math.sqrt(v.zip(q).map { case (x, qq) =>
        val d = x - qq * sc; d * d }.sum)
      (q, sc, er)
    }
    (0 until 500).foreach { i =>
      val a = unit()
      // adversarial mix: near-identical pairs (the ones losing a pair
      // would corrupt), plus random ones
      val b = if (i % 3 == 0) {
        val eps = unit(); val mixed = a.zip(eps).map { case (x, y) => x + 0.01 * y }
        val n = math.sqrt(mixed.map(x => x * x).sum); mixed.map(_ / n)
      } else unit()
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val (qa, sa, era) = quant(a); val (qb, sb, erb) = quant(b)
      val dotq = qa.zip(qb).map { case (x, y) => x.toLong * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      val ub = sa * sb * dotq + (na + era) * erb + era * nb
      assert(ub + 1e-9 >= dot,
        f"pair $i: certified UB $ub%.6f below true dot $dot%.6f")
    }
  }

  test("q140 prefilter is lossless at oracle scale AND actually bites") {
    import graft.queries.SimilarityQueries
    val withF = SimilarityQueries.semSrc(spark, sf001)
    val withoutF = SimilarityQueries.semSrc(spark, sf001, prefilter = false)
    val m1 = withF.matrix.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    val m0 = withoutF.matrix.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(m1 == m0, "the certified-bound prune must never change the matrix")
    val nCand = withF.candidates.count()
    val nSurv = withF.survivors.count()
    assert(nSurv * 10 <= nCand,
      s"prefilter must prune >=90% of the candidate mass " +
        s"(candidates=$nCand survivors=$nSurv)")
    // plan shape: the exact vec_dot runs AFTER the survivor distinct —
    // the banded join itself carries only the int8 kernel
    val plan = withF.matrix.queryExecution.executedPlan.toString
    assert(plan.contains("vec_dot_i8"), "prefilter kernel missing from plan")
  }

  test("plan-time plane literals equal the SQL md5 derivation the oracle " +
    "replays") {
    val viaSql = spark.range(8).toDF("plane").select(col("plane"),
      array((0 until 64).map(d =>
        (conv(substring(md5(concat(lit(s"pl:$d:"), col("plane"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0) - 0.5): _*).as("pv"))
      .collect()
    viaSql.foreach { r =>
      val p = r.getLong(0).toInt
      assert(r.getSeq[Double](1) ==
        graft.queries.SimilarityQueries.planeVector(p).toSeq,
        s"plane $p literal diverges from the SQL derivation")
    }
  }

  // ---- full-vocabulary Zipf draw (r15 ADVICE) ----

  test("zipf generator reaches every one of the V types per source") {
    val zd = java.nio.file.Files.createTempDirectory("graft-zv").toString
    ScaleGen.generate(spark, sf0001, zd, 1, zipfVocab = 7)
    // with ln(V+1) the top rank's mass is ln(8/7)/ln 8 ≈ 6.4% per draw —
    // hundreds of draws per source make a miss astronomically unlikely,
    // so full coverage is assertable, not just probable
    // count only the generator's w%05d types: the injected near-dup
    // ordinals (ScaleGenSpec's family law) prepend an out-of-vocabulary
    // "nd<k>" token by design
    val perSource = spark.read.parquet(s"$zd/documents.parquet")
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t").rlike("^w[0-9]{5}$"))
      .groupBy("source").agg(countDistinct("t").as("v")).collect()
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      assert(r.getLong(1) == 7L,
        s"source ${r.getString(0)}: expected all 7 types, got ${r.getLong(1)}")
    }
  }
}
