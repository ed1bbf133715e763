package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural laws of the round-12 curation/layout operators (q141–q145) —
  * invariants the DuckDB value-hash can't express: budget conservation of
  * the epoch plan, first-occurrence semantics of the line dedup, tertile
  * geometry of the perplexity buckets, clustering quality of the z-order
  * layout, and consistency of the incremental dedup verdicts with the
  * full-corpus LSH pair set.
  */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q141 epoch plan: budget conservation, epoch/remainder identity, bounds") {
    val rows = q("q141_epoch_plan").collect()
    assert(rows.nonEmpty)
    var targetSum = 0L
    rows.foreach { r =>
      val (tokens, target, epochs, rem) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(epochs >= 0 && tokens > 0)
      // the plan's identity: target = epochs·tokens + rem·tokens (rem < 1)
      assert(rem >= 0.0 && rem < 1.0, s"rem_rate out of [0,1): $rem")
      val reconstructed = epochs * tokens + math.round(rem * tokens)
      assert(math.abs(reconstructed - target) <= 1,
        s"epochs/remainder must reconstruct the target: $reconstructed vs $target")
      targetSum += target
    }
    // Σ targets = budget up to one floor-loss token per source
    val budget = graft.queries.AssemblyQueries.EpochBudget
    assert(targetSum <= budget && targetSum >= budget - rows.length,
      s"target sum $targetSum must be within floor loss of $budget")
    // the budget deliberately exceeds the corpus: some source must up-sample
    assert(rows.exists(_.getLong(4) >= 1L), "expected at least one epoch >= 1")
  }

  test("q149 epoch expansion executes exactly q141's plan, deterministically") {
    val plan = q("q141_epoch_plan").collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getDouble(5)))).toMap
    val rows = q("q149_epoch_expand").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.length == total, "every doc gets a copy count")
    rows.foreach { case (id, src, _, copies) =>
      val (epochs, rem) = plan(src)
      assert(copies == epochs || copies == epochs + 1,
        s"doc $id: $copies outside {$epochs, ${epochs + 1}}")
      if (rem == 0.0) assert(copies == epochs, s"doc $id: no remainder pass")
    }
    // the remainder draw must actually fire somewhere (budget > corpus)
    assert(rows.exists { case (_, src, _, c) => c == plan(src)._1 + 1 },
      "expected at least one remainder-pass winner")
    val again = q("q149_epoch_expand").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq, "the draw is deterministic")
  }

  test("q153 length histogram: exact bucket/pad recompute; waste bounded") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) AS nt").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    val L = graft.queries.AssemblyQueries.ChunkLen
    val expected = docs.groupBy { case (s, nt) =>
      (s, 63 - java.lang.Long.numberOfLeadingZeros(math.max(nt, 1L)).toLong)
    }.map { case (k, ds) =>
      val tok = ds.map(_._2).sum
      val pad = ds.map(d => (d._2 + L - 1) / L * L - d._2).sum
      k -> ((ds.length.toLong, tok, pad,
        BigDecimal(pad.toDouble / (tok + pad))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = q("q153_length_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == expected, s"\n got ${got.toSeq.sorted.take(6)}\n exp ${expected.toSeq.sorted.take(6)}")
    assert(got.values.forall(v => v._4 >= 0.0 && v._4 < 1.0))
  }

  test("q142 line dedup: kept lines == distinct line surface; per-doc bounds") {
    val rows = q("q142_line_dedup").collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') AS tk").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows.map(_.getLong(0)).toSet == docs.keySet)

    // Scala recompute of the same line geometry: global first-occurrence
    val lines = docs.toSeq.flatMap { case (id, tk) =>
      tk.grouped(8).zipWithIndex.map { case (w, i) => (id, i, w.mkString(" "), w.size) }
    }
    val firstOf = lines.groupBy(_._3).map { case (t, ls) =>
      t -> ls.map(l => l._1 * 1000000L + l._2).min
    }
    val expected = lines.groupBy(_._1).map { case (id, ls) =>
      val kept = ls.filter(l => firstOf(l._3) == l._1 * 1000000L + l._2)
      id -> (ls.size.toLong, (ls.size - kept.size).toLong, kept.map(_._4.toLong).sum)
    }
    rows.foreach { r =>
      val got = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(got == expected(r.getLong(0)), s"doc ${r.getLong(0)}: $got")
    }
    // dedup must actually fire on this corpus (it has replicated families)
    assert(rows.map(_.getLong(2)).sum > 0, "no duplicate lines found at all")
  }

  test("line geometry is newline-aware: \\n docs split on real lines, others window") {
    import spark.implicits._
    val fixture = Seq(
      // newline doc: blank separator dropped, surrounding whitespace
      // normalized away, duplicate line WITHIN the doc
      (1L, "alpha beta\n\n  gamma delta epsilon  \nalpha beta", "en", "sA"),
      // newline-free doc: 10 tokens -> 8-token windows [8, 2]
      (2L, "one two three four five six seven eight nine ten", "en", "sB"),
      // newline doc sharing a full line with doc 1 ACROSS sources
      (3L, "gamma delta epsilon\nunique tail line", "en", "sB"))
    val docs = fixture.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

    val ls = graft.queries.TextQueries.docLines(docs.select("doc_id", "text"))
      .orderBy("doc_id", "idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val d1 = ls.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq == Seq(0, 1, 2), "empty line must be dropped")
    assert(d1.map(_._4).toSeq == Seq(2L, 3L, 2L), "per-line token counts")
    assert(d1(0)._3 == d1(2)._3, "identical lines hash equal after trim")
    assert(d1(0)._3 != d1(1)._3)
    val d2 = ls.filter(_._1 == 2L)
    assert(d2.map(_._4).toSeq == Seq(8L, 2L), "window fallback on \\n-free doc")
    assert(ls.filter(_._1 == 3L).head._3 == d1(1)._3,
      "same token sequence must collide across docs")

    // batch q142 + q152 over the mixed fixture, hand-computed expectations
    val dir = java.nio.file.Files.createTempDirectory("graft-nlgeom").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val q142 = SparkEntry.queries("q142_line_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(q142.toSeq == Seq(
      (1L, 3L, 1L, 5L),  // within-doc dup "alpha beta" dropped once
      (2L, 2L, 0L, 10L), // both windows unique
      (3L, 2L, 1L, 3L)), // "gamma delta epsilon" first seen in doc 1
      s"q142 over the newline fixture: ${q142.toSeq}")
    val q152 = SparkEntry.queries("q152_line_provenance")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(q152.toSeq == Seq(("sA", "sB", 1L)),
      s"one line shared across sources: ${q152.toSeq}")
  }

  test("q154 threshold form == q143 rank form at sample=all, off boundary ties") {
    // with the sample widened to the whole corpus, the fitted thresholds
    // ARE the exact tertile boundary scores — every doc whose score is not
    // tied to a boundary must land in the same bucket under both forms
    val ds = graft.queries.TextQueries
      .perpThresholdDocBuckets(spark, sf001, 1L, Long.MaxValue).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("lang")), r.getLong(r.fieldIndex("sq")),
        r.getLong(r.fieldIndex("bucket")), r.getLong(r.fieldIndex("t1")),
        r.getLong(r.fieldIndex("t2"))))
    var offTie = 0
    ds.groupBy(_._2).foreach { case (lang, docs) =>
      val sorted = docs.sortBy(d => (-d._3, d._1))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case (d, i) =>
        if (d._3 != d._5 && d._3 != d._6) {
          offTie += 1
          assert(d._4 == 3L * i / n,
            s"$lang doc ${d._1}: threshold bucket ${d._4} vs rank ${3L * i / n}")
        }
      }
    }
    assert(offTie > ds.length / 2, s"law must bite: only $offTie off-tie docs")
    // and the PRODUCTION sample (bounded) still yields 3 buckets per lang
    val rows = q("q154_perplexity_thresholds").collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, bs) =>
      assert(bs.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L),
        s"$lang: sample-fitted thresholds must fill all three buckets")
    }
  }

  test("q143 perplexity buckets: tertile geometry and score monotonicity per lang") {
    val rows = q("q143_perplexity_buckets").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.size).toSeq,
        s"$lang: buckets must be dense from 0")
      val n = sorted.map(_._3).sum
      if (n >= 3) {
        assert(sorted.size == 3, s"$lang: expected 3 tertiles for $n docs")
        // rank-based tertiles: bucket sizes differ by at most 1
        assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1,
          s"$lang: tertile sizes must be balanced: ${sorted.map(_._3)}")
      }
      // head bucket holds the best (largest, least-negative) scores: each
      // bucket's worst score must be >= the next bucket's best score
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5 >= b._4, s"$lang: bucket ${a._2} worst ${a._5} < bucket ${b._2} best ${b._4}")
      }
    }
  }

  test("q144 z-order: conservation, bucket range, and real 2-D clustering") {
    val rows = q("q144_zorder_layout").collect()
    val total = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total, "every row lands in a z bucket")
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    // the whole point: each of the 64 buckets covers a small fraction of
    // BOTH dimensions (3 prefix bits each ⇒ ~1/8 of each range). A 1-D
    // sort would put ~1.0 here for the secondary dimension.
    val pkAvg = rows.map(_.getDouble(6)).sum / rows.length
    val skAvg = rows.map(_.getDouble(7)).sum / rows.length
    assert(pkAvg < 0.3, s"partkey spans not clustered: avg frac $pkAvg")
    assert(skAvg < 0.3, s"suppkey spans not clustered: avg frac $skAvg")
  }

  test("q146 coreset: ceil-fraction per cluster, centrality prefix, full coverage") {
    val rows = q("q146_cluster_coreset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    val total = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.length == total, "every vector gets a verdict")
    rows.groupBy(_._2).foreach { case (cid, ms) =>
      val kept = ms.filter(_._4)
      val expect = math.ceil(ms.length * 0.4).toLong
      assert(kept.length == expect, s"cluster $cid: ${kept.length} kept of ${ms.length}")
      assert(kept.nonEmpty, s"cluster $cid: coreset must keep the medoid")
      // kept = exactly the rank prefix, and ranks order by distance
      assert(kept.map(_._3).max <= ms.filterNot(_._4).map(_._3).minOption.getOrElse(Long.MaxValue))
      assert(kept.map(_._5).max <= ms.filterNot(_._4).map(_._5).minOption.getOrElse(Double.MaxValue) + 1e-9,
        s"cluster $cid: a kept member is farther than a dropped one")
    }
  }

  test("q147 dedup ROI: histogram == independent recompute from q65 labels") {
    val toksOf = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "size(split(trim(text), '\\\\s+')) AS nt").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val labels = q("q65_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = labels.groupBy(_._2).toSeq.map { case (cid, ms) =>
      val size = ms.size.toLong
      val dup = ms.keys.filter(_ != cid).map(toksOf).sum
      (size, dup)
    }.groupBy(_._1).map { case (size, fams) =>
      size -> ((fams.size.toLong, fams.size * size, fams.map(_._2).sum))
    }
    val got = q("q147_dedup_roi").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, s"histogram mismatch:\n got $got\n exp $expected")
    assert(got.values.map(_._2).sum == toksOf.size.toLong, "every doc in one family")
    got.get(1L).foreach { case (_, _, dup) =>
      assert(dup == 0L, "singleton families have nothing removable")
    }
  }

  test("q148 coverage curve: monotone, bounded, equals top-k mass recompute") {
    val freqs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
    val total = freqs.map(_._2).sum
    val rows = q("q148_vocab_coverage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    // every requested probe answers; beyond-vocab probes clamp to |vocab|
    assert(rows.map(_._1).toSeq ==
      Seq(4L, 8L, 16L, 32L, 8192L, 32768L, 131072L, 262144L))
    assert(q("q148_vocab_coverage").collect()
      .forall(_.getLong(3) == total), "grand total on every row")
    rows.foreach { case (reqK, k, cov, frac) =>
      assert(k == math.min(reqK, freqs.size.toLong), s"k=$reqK clamp")
      assert(cov == freqs.take(k.toInt).map(_._2).sum, s"k=$k covered mass")
      assert(frac > 0.0 && frac <= 1.0)
      if (reqK >= freqs.size) assert(frac == 1.0, s"k=$reqK full coverage")
    }
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted, "coverage monotone in k")
  }

  test("q151 dataset card: every column recomputes from the component operators") {
    val meta = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "source", "lang",
        "size(split(trim(text), '\\\\s+')) AS nt").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3).toLong))).toMap
    val quality = q("q22_quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("quality"))).toMap
    val labels = q("q65_dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("q151_dataset_card").collect()
    assert(rows.map(_.getString(0)).toSet == meta.values.map(_._1).toSet)
    rows.foreach { r =>
      val src = r.getString(0)
      val ids = meta.filter(_._2._1 == src).keys.toSeq
      assert(r.getLong(1) == ids.size)
      assert(r.getLong(2) == ids.map(meta(_)._3).sum, s"$src tokens")
      assert(r.getLong(3) == ids.map(meta(_)._2).distinct.size, s"$src langs")
      val dups = ids.count(id => labels(id) != id)
      assert(r.getLong(4) == dups, s"$src dup docs")
      assert(math.abs(r.getDouble(5) - dups.toDouble / ids.size) < 1e-6)
      // the quantized mean tracks the rounded q22 scores within quantization
      val approxMean = ids.map(quality).sum / ids.size * 1e6
      assert(math.abs(r.getLong(6) - approxMean) < 150,
        s"$src quality_q6 ${r.getLong(6)} vs ~$approxMean")
    }
  }

  test("q152 line provenance == independent recompute from the line sets") {
    val bySource = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "split(trim(text), '\\\\s+') AS tk").collect()
      .flatMap { r =>
        r.getSeq[String](1).grouped(8).map(w => (r.getString(0), w.mkString(" ")))
      }.groupBy(_._1).map { case (s, ls) => s -> ls.map(_._2).toSet }
    val expected = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      n = (bySource(a) intersect bySource(b)).size if n > 0
    } yield (a, b) -> n.toLong).toMap
    val got = q("q152_line_provenance").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"\n got ${got.toSeq.sorted.take(8)}\n exp ${expected.toSeq.sorted.take(8)}")
    assert(got.nonEmpty, "the corpus contains cross-source boilerplate")
  }

  test("q145 incremental dedup: verdicts consistent with the full LSH pair set") {
    val verdicts = q("q145_dedup_incremental").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val newIds = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 5 == 3).toSet
    assert(verdicts.keySet == newIds, "exactly the new slice is screened")
    verdicts.values.foreach { case (cand, dups, v) =>
      assert(dups <= cand, "dup matches are a subset of band candidates")
      assert(v == (if (dups > 0) "drop" else "keep"))
    }
    // any q27 near-dup pair straddling the old/new cut must flag the new doc
    val pairs = q("q27_minhash_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      Seq(a -> b, b -> a).foreach { case (x, y) =>
        if (newIds.contains(x) && !newIds.contains(y))
          assert(verdicts(x)._2 > 0,
            s"new doc $x near-dups old doc $y (q27) but was kept")
      }
    }
  }
}
