package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural laws of the round-13 operators — invariants the DuckDB
  * value-hash can't express: strength monotonicity of the dedup
  * attribution, share conservation and temperature flattening of the
  * mixture sweep, line-mass conservation of the short-line filter, and the
  * exact moment recompute behind the Zipf fit.
  */
class Round13Spec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q155 attribution: exact <= bag <= set per source; firsts conserve docs") {
    val rows = q("q155_dedup_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (src, n, ex, bg, st) =>
      assert(0 <= ex && ex <= bg && bg <= st && st <= n,
        s"$src: strengths must be monotone (ex=$ex bg=$bg set=$st n=$n)")
    }
    // global conservation: Σ dups = docs − distinct fingerprints, per form
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id",
        "regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS ex",
        "concat_ws(' ', sort_array(split(trim(text), '\\\\s+'))) AS bg",
        "concat_ws(' ', array_sort(array_distinct(split(trim(text), '\\\\s+')))) AS st")
      .collect()
    assert(rows.map(_._3).sum ==
      docs.length - docs.map(_.getString(1)).distinct.length, "exact total")
    assert(rows.map(_._4).sum ==
      docs.length - docs.map(_.getString(2)).distinct.length, "bag total")
    assert(rows.map(_._5).sum ==
      docs.length - docs.map(_.getString(3)).distinct.length, "set total")
    // the set strength must actually bite on this corpus (template families)
    assert(rows.map(_._5).sum > 0, "set-strength dups expected")
  }

  test("q156 diversity: bounded, distinct<=total, equals exact recompute at n=2") {
    val rows = q("q156_ngram_diversity").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    rows.foreach { case ((src, n), (tot, dst, div)) =>
      assert(dst >= 1 && dst <= tot, s"$src n=$n")
      assert(div > 0.0 && div <= 1.0, s"$src n=$n diversity $div")
    }
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "split(trim(text), '\\\\s+') AS tk").collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val bigrams = ds.flatMap(_._2.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq)
      val (tot, dst, _) = rows((src, 2L))
      assert(tot == bigrams.length, s"$src bigram total")
      assert(dst == bigrams.distinct.length, s"$src bigram distinct")
    }
  }

  test("q156 approx twin: within HLL error of exact, with fewer shuffles") {
    val exact = q("q156_ngram_diversity").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    val approxDf = graft.queries.TextQueries.ngramDiversityApprox(spark, sf001)
    approxDf.collect().foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (a, e) = (r.getLong(3), exact(key))
      assert(math.abs(a - e).toDouble / e <= 0.10,
        s"$key: approx $a vs exact $e beyond HLL tolerance")
    }
    // the production claim, stated structurally: the exact form must
    // shuffle the GRAM MASS (an exchange hash-partitioned on the gram
    // key), the approx form must never — its sketch merges map-side and
    // only the (source, n) rollup crosses the network
    val gramShuffle = "hashpartitioning\\([^)]*gh#".r
    val exactPlan = SparkEntry.queries("q156_ngram_diversity")(spark, sf001)
      .queryExecution.executedPlan.toString
    val approxPlan = approxDf.queryExecution.executedPlan.toString
    assert(gramShuffle.findFirstIn(exactPlan).isDefined,
      "exact distinct is expected to shuffle on the gram key")
    assert(gramShuffle.findFirstIn(approxPlan).isEmpty,
      s"approx form must never shuffle the gram mass:\n$approxPlan")
  }

  test("q157 temperature sweep: shares conserve; lower tau flattens the mixture") {
    val rows = q("q157_mixture_temperature").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4)))
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == Set(25L, 50L, 100L))
    byTau.foreach { case (tau, rs) =>
      val s = rs.map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-6, s"tau=$tau shares sum to $s")
      val budget = graft.queries.AssemblyQueries.EpochBudget
      val t = rs.map(_._4).sum
      assert(t <= budget && t >= budget - rs.length,
        s"tau=$tau targets within floor loss of budget: $t")
    }
    // flattening law: the share spread shrinks strictly as tau drops
    def spread(tau: Long) =
      byTau(tau).map(_._3).max - byTau(tau).map(_._3).min
    assert(spread(25L) < spread(50L) && spread(50L) < spread(100L),
      s"spreads ${spread(25L)}, ${spread(50L)}, ${spread(100L)}")
  }

  test("q158 line filter: mass conserves against the line geometry; filter bites") {
    val lines = graft.queries.TextQueries.docLines(
      spark.read.parquet(s"$sf001/documents.parquet")
        .select("doc_id", "text", "source"))
      .selectExpr("source", "ntk").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = lines.groupBy(_._1).map { case (src, ls) =>
      val short = ls.filter(_._2 < 5)
      src -> ((ls.length.toLong, short.length.toLong,
        short.map(_._2).sum, ls.filter(_._2 >= 5).map(_._2).sum))
    }
    val got = q("q158_line_filter").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.values.map(_._2).sum > 0, "window tails must trip the filter")
  }

  test("q160 pmi: floor respected, descending, recompute within one quantum") {
    val rows = q("q160_pmi_collocations").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.forall(_._2 >= 10), "count floor")
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sortBy(-_),
      "top-K must come back PMI-descending")
    // independent PMI recompute (±1 quantum: the quantization grid is the
    // only thing the last-ulp of two log implementations can move)
    val tks = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("split(trim(text), '\\\\s+') AS tk").collect()
      .map(_.getSeq[String](0)).filter(_.size >= 2)
    val uni = tks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = tks.flatMap(_.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = tks.map(_.size.toLong).sum.toDouble
    val b = tks.map(_.size.toLong - 1).sum.toDouble
    rows.foreach { case (bg, n, pmiQ) =>
      assert(big(bg) == n, s"$bg count")
      val Array(w1, w2) = bg.split(" ")
      val exp = math.floor(
        math.log(n.toDouble * t * t / (b * uni(w1) * uni(w2))) /
          math.log(2.0) * 1e6).toLong
      assert(math.abs(pmiQ - exp) <= 1, s"$bg: $pmiQ vs $exp")
    }
  }

  test("q161 quality drift: doc conservation and exact mean recompute per source") {
    val perDoc = graft.queries.TextQueries
      .perpThresholdDocBuckets(spark, sf001, 1L, Long.MaxValue).collect()
      .map(r => (r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("sq"))))
    val rows = q("q161_source_quality_drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._2).sum == perDoc.length, "every scored doc rolls up")
    def fdiv(a: Long, n: Long) = (a - (((a % n) + n) % n)) / n
    perDoc.groupBy(_._1).foreach { case (src, ds) =>
      val (_, n, mean, best, worst) = rows.find(_._1 == src).get
      assert(n == ds.length)
      assert(best == ds.map(_._2).max && worst == ds.map(_._2).min)
      assert(mean == fdiv(ds.map(d => fdiv(d._2, 1000L)).sum, n),
        s"$src mean_q3")
    }
  }

  test("q162 line leakage: exact recompute from the line sets; leakage bites") {
    val splits = SparkEntry.queries("q126_cluster_split")(spark, sf001)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lines = graft.queries.TextQueries.docLines(
        spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text"))
      .select("doc_id", "h").collect()
      .map(r => (splits(r.getLong(0)), r.getLong(1)))
    val bySplit = lines.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val train = bySplit("train")
    val rows = q("q162_split_line_leakage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == bySplit.keySet - "train")
    rows.foreach { case (split, n, leaked, frac) =>
      val s = bySplit(split)
      assert(n == s.size, s"$split distinct lines")
      assert(leaked == (s & train).size, s"$split leaked")
      assert(math.abs(frac - leaked.toDouble / n) < 1e-6)
    }
    // the cluster-aware split EXISTS to prevent this: dup families route
    // whole, so zero lines cross the fence here — while the naive
    // doc_id-mod split on the SAME line sets leaks. The metric bites
    // where leakage exists, and q126 is what keeps it at zero.
    assert(rows.map(_._3).sum == 0,
      "cluster-aware split must keep line leakage at zero on this corpus")
    val naiveBySplit = graft.queries.TextQueries.docLines(
        spark.read.parquet(s"$sf001/documents.parquet").select("doc_id", "text"))
      .select("doc_id", "h").collect()
      .map(r => (r.getLong(0) % 3, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val naiveLeak = (naiveBySplit(1L) & naiveBySplit(0L)).size +
      (naiveBySplit(2L) & naiveBySplit(0L)).size
    assert(naiveLeak > 0,
      "a naive doc_id-mod split must leak on this corpus (the metric bites)")
  }

  test("q163 source KL: all pairs, near-non-negative, exact recompute for one pair") {
    val rows = q("q163_source_kl").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val srcs = rows.keys.flatMap(p => Seq(p._1, p._2)).toSet
    assert(rows.size == srcs.size * (srcs.size - 1) / 2, "every pair present")
    // KL >= 0 up to quantization: each of the 2·HeadK floors loses < 1
    rows.values.foreach(v => assert(v >= -2L * 256,
      s"symmetric KL must be non-negative up to floor loss: $v"))
    // exact recompute for the lexicographically first pair
    val (pa, pb) = rows.keys.minBy(identity)
    val tf = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "explode(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("source", "tok").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val head = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(256).map(_._1)
    def dist(src: String) = {
      val cs = head.map(t => tf.getOrElse((src, t), 0L))
      (cs, cs.sum)
    }
    val ((ca, na), (cb, nb)) = (dist(pa), dist(pb))
    val exp = head.indices.map { i =>
      val p = (ca(i) + 1.0) / (na + 256)
      val qq = (cb(i) + 1.0) / (nb + 256)
      math.floor(p * (math.log(p / qq) / math.log(2.0)) * 1e9).toLong +
        math.floor(qq * (math.log(qq / p) / math.log(2.0)) * 1e9).toLong
    }.sum
    // ±1 quantum per floored term (two log implementations' last ulp)
    assert(math.abs(rows((pa, pb)) - exp) <= 2L * 256,
      s"($pa,$pb): ${rows((pa, pb))} vs $exp")
  }

  test("q164 threshold curve: cumulative law and agreement with q27's fixed cut") {
    val rows = q("q164_dedup_threshold_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // cumulative = suffix sum of the histogram, monotone non-increasing in k
    val byK = rows.sortBy(_._1)
    byK.zipWithIndex.foreach { case ((k, _, cum), i) =>
      val expCum = byK.drop(i).map(_._2).sum
      assert(cum == expCum, s"k=$k cumulative")
    }
    // the curve at k = NumHashes/2 IS q27's pair count (est-J >= 0.5)
    val q27n = q("q27_minhash_lsh").count()
    val at6 = byK.filter(_._1 >= 6).map(_._2).sum
    assert(at6 == q27n, s"curve at 0.5 ($at6) must equal q27 ($q27n)")
    assert(byK.exists(_._1 < 6), "sub-threshold candidates must be visible")
  }

  test("q165 window sweep: exact recompute; waste grows with window on short docs") {
    val nts = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("size(split(trim(text), '\\\\s+')) AS nt").collect()
      .map(_.getInt(0).toLong)
    val rows = q("q165_pad_window_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(64L, 128L, 256L, 512L))
    rows.foreach { case (w, nd, tok, pad, frac) =>
      assert(nd == nts.length && tok == nts.sum)
      val expPad = nts.map(nt => (nt + w - 1) / w * w - nt).sum
      assert(pad == expPad, s"window $w pad")
      assert(math.abs(frac - pad.toDouble / (tok + pad)) < 1e-6)
    }
    assert(rows.map(_._5).toSeq == rows.map(_._5).toSeq.sorted,
      "waste must grow with the window on this short-doc corpus")
  }

  test("q159 zipf slope: negative everywhere; exact moment recompute for one source") {
    val rows = q("q159_zipf_slope").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (src, m, slope) =>
      assert(m >= 2, s"$src points")
      assert(slope < 0.0 && slope > -5.0, s"$src slope $slope")
    }
    // exact recompute, one source, straight from token frequencies
    val src0 = rows.head._1
    val freqs = spark.read.parquet(s"$sf001/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("source") === src0)
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS tok")
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
    // apply the SAME per-source head cut the query applies (r13 ADVICE);
    // inactive on this 31-type vocabulary — Round14Spec's wide-vocab
    // fixture exercises the active branch
    val pts = freqs.take(graft.queries.TextQueries.ZipfMaxK)
      .zipWithIndex.map { case ((_, n), i) =>
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
    assert(math.abs(rows.find(_._1 == src0).get._3 - slope) < 1e-9,
      s"$src0: ${rows.find(_._1 == src0).get._3} vs $slope")
  }
}
