package graft

import graft.queries.{BandSkewReport, SimilarityQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural laws of the round-17 changes: the tau-derived certified
  * prune threshold, the library two-stage ANN pair form (bit-identical
  * to the exact kernel — the measured-reversal twin of q140's win), the
  * native `ivf_top_picks` restricted argmin, the vector-sum centroid
  * update, the vec_dot_i8 equal-length contract, and the mixed-schema
  * band-audit reader.
  */
class Round17Spec extends AnyFunSuite {
  import TestSpark._

  // ---- certBound: derived from the tau, not a hardcoded twin (r16 ADVICE) ----

  test("certBound is exactly the HALF_UP-4dp admission boundary minus slack") {
    // the law the lossless prune rests on: round(c,4) >= tau  ⇒  c >= certBound(tau)
    Seq(0.4, 0.9).foreach { tau =>
      val cb = SimilarityQueries.certBound(tau)
      assert(cb < tau - 5e-5 && cb > tau - 5e-5 - 1e-8)
      var c = tau - 6e-5
      while (c <= tau + 1e-5) {
        val r4 = java.math.BigDecimal.valueOf(c)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        if (r4 >= tau) assert(c >= cb,
          f"cos=$c%.9f passes the exact gate but would be pruned at $cb%.9f")
        c += 1e-7
      }
    }
  }

  test("int8 prefilter bound is sound for RAW (non-unit) vectors — the " +
    "normalized kernel form the ANN tier evaluates") {
    val rnd = new scala.util.Random(1707)
    def vec(scale: Double): Array[Double] =
      Array.fill(64)(rnd.nextGaussian() * scale)
    def quant(v: Array[Double]): (Array[Byte], Double, Double) = {
      val ma = v.map(math.abs).max
      val sc = ma / 127.0
      val q = v.map(x => java.math.BigDecimal.valueOf(x / sc)
        .setScale(0, java.math.RoundingMode.HALF_UP).byteValueExact())
      val er = math.sqrt(v.zip(q).map { case (x, qq) =>
        val d = x - qq * sc; d * d }.sum)
      (q, sc, er)
    }
    (0 until 300).foreach { i =>
      val a = vec(0.1 + rnd.nextDouble() * 20)   // norms span ~0.8..160
      val b = vec(0.1 + rnd.nextDouble() * 20)
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      val cos = a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
      val (qa, sa, era) = quant(a); val (qb, sb, erb) = quant(b)
      val dotq = qa.zip(qb).map { case (x, y) => x.toLong * y }.sum
      val (ua, ea) = (sa / na, era / na)
      val (ub, eb) = (sb / nb, erb / nb)
      val ubnd = ua * ub * dotq + (1.0 + ea) * eb + ea
      assert(ubnd + 2e-9 >= cos,
        f"pair $i: normalized UB $ubnd%.9f below true cosine $cos%.9f")
    }
  }

  // ---- the library two-stage pair form: bit-identical to the exact kernel ----

  test("staged int8 pair tail == exact kernel on the real corpus (pairs " +
    "AND rounded cosines)") {
    val assigned = SimilarityQueries.ivf2Assigned(spark, sf001)
    val vecs = SimilarityQueries.ivf2Vecs(spark, sf001)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(SimilarityQueries.ivf2Pairs(assigned))
    val staged = rows(SimilarityQueries.neardupPairsStaged(assigned, vecs))
    assert(exact == staged,
      s"staged two-stage verify diverged: only-exact=${exact -- staged} " +
        s"only-staged=${staged -- exact}")
    assert(exact.nonEmpty)
  }

  // ---- native restricted argmin == the interpreted HOF form ----

  test("ivf_top_picks replays the transform+array_sort+slice form " +
    "bit-identically, ties and short groups included") {
    graft.functions.DotProductExpression.register(spark)
    graft.functions.IvfTopPicksExpression.register(spark)
    // synthetic group: 150 vectors x 11 centroids, two centroids
    // DUPLICATED (c_id tie-break must decide), one group smaller than
    // nPicks (slice degrades to the full group)
    val df = spark.range(150).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), d -> " +
        "cast(pmod(hash(id, d), 1000) as double) / 250.0 - 2.0)").as("v"))
      .withColumn("vv",
        expr("aggregate(transform(v, x -> x * x), 0d, (a, b) -> a + b)"))
    val cents = spark.range(11).select(
      expr("id % 9").as("seed"), col("id").as("c_id"))
      .select(col("c_id"),
        expr("transform(sequence(0, 15), d -> " +
          "cast(pmod(hash(seed, d), 1000) as double) / 250.0 - 2.0)").as("cv"))
      .withColumn("cc",
        expr("aggregate(transform(cv, x -> x * x), 0d, (a, b) -> a + b)"))
      .agg(collect_list(struct(col("c_id"), col("cv"), col("cc"))).as("cents"))
    Seq(1, 2, 3, 20).foreach { nPicks =>
      val joined = df.crossJoin(cents)
      val native = joined.select(col("vec_id"),
        call_function("ivf_top_picks", col("v"), col("vv"), col("cents"),
          lit(nPicks)).as("picks"))
      val hof = joined.select(col("vec_id"),
        slice(array_sort(transform(col("cents"), c =>
          struct(round(col("vv") - lit(2.0) *
            call_function("vec_dot", col("v"), c.getField("cv"))
            + c.getField("cc"), 6).as("rd2"),
            c.getField("c_id").as("c_id")))), 1, nPicks).as("picks"))
      val n = native.collect().map(r => (r.getLong(0), r.getSeq[Any](1))).toMap
      val h = hof.collect().map(r => (r.getLong(0), r.getSeq[Any](1))).toMap
      assert(n.keySet == h.keySet)
      n.keySet.foreach { k =>
        assert(n(k).toString == h(k).toString,
          s"nPicks=$nPicks vec $k: native=${n(k)} hof=${h(k)}")
      }
    }
  }

  // ---- vector-sum centroid update == the explode form ----

  test("VecSumAggregator centroid means equal the posexplode+avg form " +
    "after the shared 9-dp round") {
    val e = Tables.load(spark, sf001, "embeddings")
      .select(col("label").cast("long").as("c_id"),
        col("embedding").cast("array<double>").as("v"))
    val viaAgg = e.groupBy("c_id")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.VecSumAggregator.vecSum(col("v")).as("sv"))
      .select(col("c_id"),
        transform(col("sv"), x => round(x / col("cnt"), 9)).as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = e
      .select(col("c_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("c_id", "pos").agg(round(avg("x"), 9).as("cx"))
      .groupBy("c_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        s => s.getField("cx")).as("cv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.keySet.foreach { k =>
      assert(viaAgg(k) == viaExplode(k), s"centroid $k diverged")
    }
  }

  // ---- vec_dot_i8 equal-length contract (r16 ADVICE) ----

  test("vec_dot_i8 fails loudly on mismatched lengths instead of silently " +
    "truncating (a truncated dot would unsound the certified bound)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array[Byte](1, 2, 3))
    val b3 = new GenericArrayData(Array[Byte](4, 5, 6))
    val b2 = new GenericArrayData(Array[Byte](4, 5))
    assert(graft.functions.Int8DotExpression.dot(a, b3) == 1 * 4 + 2 * 5 + 3 * 6)
    intercept[IllegalArgumentException] {
      graft.functions.Int8DotExpression.dot(a, b2)
    }
  }

  // ---- the media route: one call leaves store + pairs + audit ----

  test("StreamingMediaRoute: a two-batch media stream leaves the phash " +
    "store, the exact q170 pair set, and tier=phash audit rows — zero " +
    "operator calls beyond route()") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-mroute").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-mroute-ck").toString
    val fix = graft.multimodal.MediaFixture
      .generatePhash(spark, 40).collect().toSeq
    // plus two flat images — quarantined from pairs, visible to the audit
    def grft(id: Long, f: Int => Int): graft.multimodal.MediaRow = {
      val b = java.nio.ByteBuffer.allocate(13 + 72)
      b.put("GRFT".getBytes("US-ASCII")); b.put(1.toByte)
      b.putInt(64); b.putInt(48)
      (0 until 72).foreach(i => b.put((f(i) & 0xff).toByte))
      graft.multimodal.MediaRow(id, "image", b.array(),
        graft.multimodal.MediaMeta("x-graft/image", 64, 48, -1, -1))
    }
    val flats = Seq(grft(900L, _ => 77), grft(901L, _ => 77))
    val (firstHalf, secondHalf) = fix.splitAt(20)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.multimodal.MediaRow]
    val qy = graft.streaming.StreamingMediaRoute.route(ms.toDS(), root, ck,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50),
      auditCadence = 1L)
    try {
      ms.addData(firstHalf ++ flats); qy.processAllAvailable()
      ms.addData(secondHalf); qy.processAllAvailable()
    } finally qy.stop()
    // pair union over batches == the batch q170 kernel on the full set
    val streamed = graft.streaming.StreamingMediaRoute.pairs(spark, root)
      .select("a_id", "b_id").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ph = graft.multimodal.MediaFunctions.perceptualHash(
      spark.createDataset(fix ++ flats)).toDF()
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
    assert(batch.nonEmpty, "the fixture must contain near-dup families")
    assert(streamed.forall { case (a, b) => a < 900L && b < 900L },
      "flat images must never pair")
    // the store carries every fingerprint including the degenerate ones
    assert(graft.streaming.StreamingMediaRoute.phashes(spark, root).count()
      == (fix.size + flats.size).toLong)
    // the audit sidecar ran on the cadence with tier=phash and counted
    // the quarantined mass
    val audit = graft.queries.BandSkewReport.runs(spark, s"$root/phash_audit")
    val last = audit.filter(col("run_id") === 1L)
    assert(last.count() == 8L, "8 block rows on the batch-1 run")
    assert(last.collect().forall(r => r.getAs[String]("tier") == "phash"
      && r.getAs[Long]("n_quarantined") == 2L))
  }

  // ---- zipf media fixture (r16 verdict item 5) ----

  test("grftWithHash inverts the dHash kernel exactly — including the two " +
    "degenerate targets and random 64-bit patterns") {
    val rnd = new scala.util.Random(1705)
    val targets = Seq(0L, -1L, 1L, 12L, Long.MinValue, Long.MaxValue) ++
      Seq.fill(50)(rnd.nextLong())
    targets.foreach { t =>
      val got = graft.multimodal.MediaFunctions.dHash(
        ScaleGen.grftWithHash(7L, t).content)
      assert(got == t, s"target ${t.toHexString} round-tripped to ${got.toHexString}")
    }
  }

  test("zipfMedia ships the controlled skew: linear flats (quarantined), " +
    "the fixed hot near-flat class, and the family-structured base") {
    import spark.implicits._
    val m = ScaleGen.zipfMedia(spark, 1)
    val ph = graft.multimodal.MediaFunctions.perceptualHash(
      m.as[graft.multimodal.MediaRow](
        org.apache.spark.sql.Encoders.product[graft.multimodal.MediaRow]))
      .collect().map(p => p.mediaId -> p.phash).toMap
    val flats = ph.filter { case (id, _) => id >= 10000000L && id < 20000000L }
    assert(flats.size == 24 && flats.values.forall(_ == 0L),
      "10% of the base must be true-flat degenerates")
    val near = ph.filter { case (id, _) => id >= 20000000L }
    assert(near.size == 12 && near.toSeq.sortBy(_._1).map(_._2) ==
      (1L to 12L), "the near-flat class must carry dHash 1..12 exactly")
    // pairwise hamming of the near-flat class stays under the threshold —
    // one hot block-0 bucket, the realistic skew shape
    val vs = near.values.toSeq
    for (a <- vs; b <- vs if a < b)
      assert(java.lang.Long.bitCount(a ^ b) <= 7)
    assert(ph.count { case (id, _) => id < 10000000L } ==
      graft.queries.MultimodalQueries.PhashRows)
  }

  // ---- audit→dial loop (r16 verdict item 6) ----

  test("a skewed persisted audit raises the shard dial on the next run; " +
    "a benign audit and an unregistered session keep the count formula") {
    import spark.implicits._
    import graft.queries.DedupQueries
    def auditRow(runId: Long, mass: Long, nDocs: Long) =
      (("minhash"), 0, 0, 10L, 5L, mass, 0L, nDocs, 0, runId)
    def writeRun(dir: String, runId: Long, mass: Long, nDocs: Long): Unit =
      Seq(auditRow(runId, mass, nDocs))
        .toDF("tier", "bits", "band", "n_buckets", "max_occ", "pair_mass",
          "n_quarantined", "n_docs", "adaptive_bits", "run_id")
        .write.parquet(s"$dir/run=$runId")
    try {
      // benign: worst band mass ≤ AuditMassPerDoc·n ⇒ no raise
      val benign = java.nio.file.Files.createTempDirectory("graft-dialb").toString
      writeRun(benign, 0L, mass = 900L, nDocs = 1000L)
      assert(DedupQueries.useAuditDial(spark, benign) == 0)
      // skewed: one hot band at 9× the target ⇒ ceil(log2 9) = 4 extra bits
      val skewed = java.nio.file.Files.createTempDirectory("graft-dials").toString
      writeRun(skewed, 0L, mass = 18000L, nDocs = 1000L)
      val extra = DedupQueries.useAuditDial(spark, skewed)
      assert(extra == 4, s"expected ceil(log2(18000/2000)) = 4, got $extra")
      // the LATEST run wins: a later healthy run withdraws the raise
      writeRun(skewed, 3L, mass = 100L, nDocs = 1000L)
      assert(DedupQueries.useAuditDial(spark, skewed) == 0)
      // ad-hoc ids DESCEND: the newest ad-hoc run is the MINIMUM; and a
      // cadence run (≥ 0) outranks any ad-hoc history
      val adhoc = java.nio.file.Files.createTempDirectory("graft-diala").toString
      writeRun(adhoc, -1L, mass = 100L, nDocs = 1000L)
      writeRun(adhoc, -2L, mass = 18000L, nDocs = 1000L)
      assert(DedupQueries.useAuditDial(spark, adhoc) == 4,
        "the newest (most negative) ad-hoc run must win")
      writeRun(adhoc, 0L, mass = 100L, nDocs = 1000L)
      assert(DedupQueries.useAuditDial(spark, adhoc) == 0,
        "a cadence run outranks ad-hoc history")
      // a real (benign) corpus audit through the real writer: no raise
      val real = java.nio.file.Files.createTempDirectory("graft-dialr").toString
      graft.queries.BandSkewReport.maintainEvery(spark, sf001, real, 0L, 1L)
      assert(DedupQueries.useAuditDial(spark, real) == 0,
        "the sf0.01 corpus must not trip the learned raise")
      // empty/missing dirs fall back to the formula
      assert(DedupQueries.useAuditDial(spark, "/tmp/graft-no-such-dial") == 0)
      // and the raise actually reaches the banding consumers: with the
      // dial registered, LSH pairs are a SUBSET of the unregistered
      // result (the Round14Spec sharded-⊆-unsharded law, learned-driven)
      DedupQueries.clearAuditDial(spark)
      def q27pairs() = SparkEntry.queries("q27_minhash_lsh")(spark, sf001)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val unsharded = q27pairs()
      val skewed2 = java.nio.file.Files.createTempDirectory("graft-dial2").toString
      writeRun(skewed2, 0L, mass = 18000L, nDocs = 1000L)
      assert(DedupQueries.useAuditDial(spark, skewed2) == 4)
      val sharded = q27pairs()
      assert(sharded.subsetOf(unsharded),
        "learned-sharded candidates must never invent pairs")
      assert(sharded.nonEmpty, "the family dups must survive 4 extra bits")
    } finally DedupQueries.clearAuditDial(spark)
  }

  // ---- mixed-schema band-audit dirs degrade consistently (r16 ADVICE) ----

  test("BandSkewReport.runs reads pre-r16 leaves with documented defaults " +
    "next to new-schema runs") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-bsmx").toString
    // a pre-r16 leaf: no tier, no n_quarantined, no run_id
    Seq((0, 0, 10L, 3L, 3L, 100L, 4))
      .toDF("bits", "band", "n_buckets", "max_occ", "pair_mass", "n_docs",
        "adaptive_bits")
      .write.parquet(s"$out/run=7")
    // a new-schema cadence run next to it
    BandSkewReport.maintainEvery(spark, sf0001, out, 0L, 1L)
    val rows = BandSkewReport.runs(spark, out)
    assert(rows.columns.toSet.contains("tier") &&
      rows.columns.toSet.contains("n_quarantined") &&
      rows.columns.toSet.contains("run_id"))
    val legacy = rows.filter(col("run_id").isNull).collect()
    assert(legacy.length == 1, "the pre-r16 leaf must surface exactly once")
    assert(legacy(0).getAs[String]("tier") == "minhash")
    assert(legacy(0).getAs[Long]("n_quarantined") == 0L)
    val fresh = rows.filter(col("run_id") === 0L)
    assert(fresh.count() > 0, "the new-schema run must keep its columns")
  }
}
