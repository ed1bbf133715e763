package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 laws: the adaptive MinHash band dial (subset + monotonicity +
  * ladder), the q154 unfitted-language census (batch == streaming gate on
  * the −1 semantics), head-cut-ACTIVE recomputes for q159/q163 on a
  * wide-vocabulary fixture (r13 ADVICE: the sf0.01 corpus's 31-token
  * vocabulary never exercises the production branch), the HostRef pin, and
  * the per-path decode-cache release.
  */
class Round14Spec extends AnyFunSuite {
  import TestSpark._

  // ---- wide-vocabulary fixture: 400 token types > KlHeadK(256) >
  // ZipfMaxK(64), Zipf-shaped draws, deterministic (hash-seeded, never
  // rand()), with one language confined OUTSIDE q154's fit-sample id range
  private lazy val wideDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wide").toString
    val v = 400
    def u(d: Long, p: Int): Double = {
      val h = scala.util.hashing.MurmurHash3.productHash((d, p))
      ((h & 0x7fffffff).toDouble + 0.5) / 0x80000000L.toDouble
    }
    // log-uniform rank = Zipf(s=1); per-source rank rotation makes the
    // sources genuinely divergent (KL > 0, distinct slopes)
    def tok(d: Long, p: Int): String = {
      val r = math.min(v - 1, math.floor(math.exp(u(d, p) * math.log(v))).toInt)
      val rot = (r + (d % 4).toInt * 7) % v
      f"w$rot%03d"
    }
    val rows = (1L to 300L).map { d =>
      val text = (0 until 60).map(p => tok(d, p)).mkString(" ")
      val lang = if (d % 30 == 1) "zz" else "en"
      (d, text, lang, s"s${d % 4}", text.length.toLong)
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("band dial: ladder boundaries and monotone subset law") {
    import graft.queries.DedupQueries._
    assert(bandShardBits(1L) == 0)
    assert(bandShardBits(BandTargetDocs) == 0)
    assert(bandShardBits(BandTargetDocs + 1) == 1)
    assert(bandShardBits(BandTargetDocs * 2) == 1)
    assert(bandShardBits(BandTargetDocs * 2 + 1) == 2)
    assert(bandShardBits(Long.MaxValue) == MaxShardBits)
    // sharded candidates are a SUBSET of the unsharded ones (the dial only
    // splits buckets, never merges), so est-J-verified pairs can only be
    // pruned, never invented
    val p0 = candidatePairs(spark, sf001, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p3 = candidatePairs(spark, sf001, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p3.subsetOf(p0), "bits=3 candidates must be a subset of bits=0")
    assert(candidatePairCount(spark, sf001, 8) <= p3.size.toLong,
      "candidate mass must be monotone non-increasing in bits")
  }

  test("q154 census: unfitted language surfaces as bucket -1, batch == gate") {
    val perDoc = graft.queries.TextQueries
      .perpThresholdDocBuckets(spark, wideDir,
        graft.queries.TextQueries.PerpSampleMod,
        graft.queries.TextQueries.PerpSampleMax)
      .select("doc_id", "lang", "bucket").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
    assert(perDoc.nonEmpty)
    val (zz, en) = perDoc.partition(_._2._1 == "zz")
    assert(zz.nonEmpty, "fixture must contain the unfitted language")
    zz.foreach { case (d, (_, b)) =>
      assert(b == -1L, s"doc $d: unfitted lang must bucket -1, got $b") }
    assert(en.forall { case (_, (_, b)) => b >= 0 && b <= 2 },
      "fitted language must bucket 0..2")
    // the streaming gate agrees doc-for-doc (the r13 ADVICE consistency:
    // batch census and serve-online verdicts share the -1 semantics)
    val model = graft.streaming.StreamingQualityGate.fit(spark, wideDir)
    val batch = spark.read.parquet(s"$wideDir/documents.parquet")
      .select(col("doc_id").as("docId"), col("lang"), col("text"))
    val gate = graft.streaming.StreamingQualityGate.bucketBatch(batch, model)
      .select("doc_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    perDoc.foreach { case (d, (_, b)) =>
      assert(gate(d) == b, s"doc $d: gate ${gate(d)} vs batch $b") }
  }

  test("q159 on wide vocab: per-source head cut ACTIVE, exact recompute") {
    val zk = graft.queries.TextQueries.ZipfMaxK
    val rows = SparkEntry.queries("q159_zipf_slope")(spark, wideDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // the cut must bite: every source's vocab exceeds ZipfMaxK, so every
    // fit uses exactly ZipfMaxK points
    rows.foreach { case (src, m, sl) =>
      assert(m == zk, s"$src: head cut inactive (m=$m, vocab <= $zk?)")
      assert(sl < 0.0, s"$src slope $sl")
    }
    // exact recompute for one source, APPLYING the same per-source top-K
    val src0 = rows.head._1
    val freqs = spark.read.parquet(s"$wideDir/documents.parquet")
      .filter(col("source") === src0)
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
    assert(freqs.length > zk, "per-source vocab must exceed the head")
    val pts = freqs.take(zk).zipWithIndex.map { case ((_, n), i) =>
      (math.floor(math.log(i + 1.0) * 1e6).toLong,
        math.floor(math.log(n.toDouble) * 1e6).toLong)
    }
    val m = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = BigDecimal((m * sxy - sx * sy).toDouble /
      (m * sxx - sx * sx).toDouble)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.find(_._1 == src0).get._3 - slope) < 1e-9)
  }

  test("q163 on wide vocab: global head cut ACTIVE, exact recompute") {
    val hk = graft.queries.TextQueries.KlHeadK
    val rows = SparkEntry.queries("q163_source_kl")(spark, wideDir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    val tf = spark.read.parquet(s"$wideDir/documents.parquet")
      .selectExpr("source", "explode(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("source", "tok").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val vocab = tf.keySet.map(_._2)
    assert(vocab.size > hk, "global vocab must exceed KlHeadK")
    val head = vocab.toSeq.map(t =>
        (t, tf.collect { case ((_, tk), n) if tk == t => n }.sum))
      .sortBy { case (t, n) => (-n, t) }.take(hk).map(_._1)
    val (pa, pb) = rows.keys.minBy(identity)
    def dist(src: String) = {
      val cs = head.map(t => tf.getOrElse((src, t), 0L))
      (cs, cs.sum)
    }
    val ((ca, na), (cb, nb)) = (dist(pa), dist(pb))
    val exp = head.indices.map { i =>
      val p = (ca(i) + 1.0) / (na + hk)
      val qq = (cb(i) + 1.0) / (nb + hk)
      math.floor(p * (math.log(p / qq) / math.log(2.0)) * 1e9).toLong +
        math.floor(qq * (math.log(qq / p) / math.log(2.0)) * 1e9).toLong
    }.sum
    assert(math.abs(rows((pa, pb)) - exp) <= 2L * hk,
      s"($pa,$pb): ${rows((pa, pb))} vs $exp")
  }

  test("q167 heaps law: monotone curve, totals close the corpus, wide-vocab recompute") {
    val rows = SparkEntry.queries("q167_heaps_law")(spark, wideDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 8L))
    Seq(rows.map(_._2), rows.map(_._3), rows.map(_._4)).foreach(cum =>
      assert(cum.toSeq == cum.sorted.toSeq,
        "cumulative columns must be monotone"))
    // the final checkpoint closes the corpus exactly
    val docs = spark.read.parquet(s"$wideDir/documents.parquet")
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') AS t").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
    val last = rows.last
    assert(last._2 == docs.length)
    assert(last._3 == docs.map(_._2.length.toLong).sum)
    assert(last._4 == docs.flatMap(_._2).distinct.length.toLong)
    // type accumulation must genuinely bend (Heaps): the first checkpoint
    // already holds a large share of types on a Zipf corpus
    assert(rows.head._4 > last._4 / 4, "head checkpoint types too few")
  }

  test("q168 burstiness: head recompute, cf >= df, quantized ratio exact") {
    val rows = SparkEntry.queries("q168_token_burstiness")(spark, wideDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 40)
    rows.foreach { case (t, cf, df, q6) =>
      assert(cf >= df && df >= 1, s"$t")
      assert(q6 == cf * 1000000L / df, s"$t quantized ratio")
    }
    // exact head recompute
    val perDoc = spark.read.parquet(s"$wideDir/documents.parquet")
      .selectExpr("doc_id", "explode(split(trim(text), '\\\\s+')) AS tok")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byTok = perDoc.groupBy(_._2).map { case (t, xs) =>
      (t, xs.length.toLong, xs.map(_._1).distinct.length.toLong) }.toSeq
    val head = byTok.sortBy { case (t, cf, _) => (-cf, t) }.take(40)
      .map { case (t, cf, df) => (t, cf, df, cf * 1000000L / df) }
    assert(rows.toSeq == head)
  }

  test("HostRef.Rate is pinned to the committed baseline artifact") {
    // resolve the artifact against the repo ROOT (nearest ancestor with
    // build.sbt — the ChainOracle.Dir rule), not the process cwd: a forked
    // test JVM or IDE runner with a different working directory must fail
    // on a real desynchronization, never on path resolution (r14 ADVICE)
    @annotation.tailrec
    def findRoot(d: java.io.File): java.io.File =
      if (new java.io.File(d, "build.sbt").isFile || d.getParentFile == null) d
      else findRoot(d.getParentFile)
    val root = findRoot(new java.io.File(sys.props("user.dir")))
    val line = java.nio.file.Files.readString(
      new java.io.File(root, HostRef.Artifact).toPath).linesIterator.next()
    val m = """"mainnet_blocks_per_s":([0-9.]+)""".r
      .findFirstMatchIn(line)
    assert(m.isDefined, s"${HostRef.Artifact} lacks mainnet_blocks_per_s")
    val rate = m.get.group(1).toDouble
    assert(math.abs(rate - HostRef.Rate) < 1e-6,
      s"HostRef.Rate ${HostRef.Rate} desynchronized from artifact $rate — " +
        "update HostRef when the committed baseline pair refreshes")
  }

  test("streaming surfaces mount as catalog views readable from a second session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sviews").toString
    // gate: route two docs through the quality gate into batch=* dirs
    val model = graft.streaming.StreamingQualityGate.fit(spark, sf0001)
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      graft.streaming.StreamingQualityGate.Doc]
    docs.addData(
      graft.streaming.StreamingQualityGate.Doc(1L, "en", "alpha beta gamma"),
      graft.streaming.StreamingQualityGate.Doc(2L, "en", "x"))
    val gq = graft.streaming.StreamingQualityGate.route(
      docs.toDS(), model, s"$root/gate", s"$root/gate-ckpt")
    gq.processAllAvailable(); gq.stop()
    // drift: two finalized windows into an append-only parquet table
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val dstream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    dstream.addData((ts(1), "table scan zzz"), (ts(40), "join"), (ts(90), "flush"))
    val dq = graft.streaming.CorpusDriftMonitor.route(
      dstream.toDF().toDF("ts", "text"), vocab = Seq("table", "scan", "join"),
      width = "10 minutes", qualityMin = 0.0,
      out = s"$root/drift", checkpointDir = s"$root/drift-ckpt",
      watermark = "10 minutes")
    dq.processAllAvailable(); dq.stop()
    graft.queries.CorpusSurface.mountStreams(spark,
      driftDir = Some(s"$root/drift"), gateDir = Some(s"$root/gate"))
    // a SECOND session reads both by name — zero Scala, fresh listing
    val s2 = spark.newSession()
    val gate = s2.sql(
      "SELECT doc_id, bucket FROM corpus_gate_verdicts ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gate.length == 2)
    assert(gate(1) == ((2L, -1L)), s"1-token doc must gate -1: ${gate.toSeq}")
    val drift = s2.sql(
      "SELECT win_start, n_docs, n_oov FROM corpus_drift_windows ORDER BY win_start")
      .collect()
    assert(drift.nonEmpty, "finalized drift windows must be visible")
    assert(drift.head.getLong(1) == 1 && drift.head.getLong(2) == 1,
      s"window-1 counters wrong: ${drift.toSeq}")
  }

  test("mountStreams fails fast on a not-yet-committed stream surface") {
    val empty = java.nio.file.Files.createTempDirectory("graft-nostream").toString
    val e = intercept[IllegalStateException] {
      graft.queries.CorpusSurface.mountStreams(spark,
        gateDir = Some(s"$empty/gate"))
    }
    assert(e.getMessage.contains("no committed stream output"),
      s"wrong contract error: ${e.getMessage}")
  }

  test("corpus decode cache: keyed per path, released per path") {
    import graft.sources.CorpusSource
    val dir = java.nio.file.Files.createTempDirectory("graft-cs").toString
    def writeJsonl(name: String): String = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p,
        """{"doc_id":1,"text":"a b","lang":"en","source":"s"}""".getBytes)
      p.toString
    }
    val (p1, p2) = (writeJsonl("a.jsonl"), writeJsonl("b.jsonl"))
    val before = CorpusSource.cachedKeys(spark)
    assert(CorpusSource.fromJsonl(spark, p1).docs.count() == 1)
    assert(CorpusSource.fromJsonl(spark, p2).docs.count() == 1)
    // re-ingesting the same dump must NOT pin a second decode
    CorpusSource.fromJsonl(spark, p1)
    val added = CorpusSource.cachedKeys(spark) -- before
    assert(added == Set(s"jsonl:$p1", s"jsonl:$p2"))
    // releasing one path leaves the other warm
    CorpusSource.release(spark, p1)
    val after = CorpusSource.cachedKeys(spark) -- before
    assert(after == Set(s"jsonl:$p2"))
    CorpusSource.release(spark, p2)
    assert((CorpusSource.cachedKeys(spark) -- before).isEmpty)
  }
}
