package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (the "would this survive 100×" checks): filters
  * and projections must reach the parquet scan, small dims must broadcast,
  * top-K must plan as TakeOrderedAndProject (no global sort), and the UTXO
  * trick must stay a single shuffle-stage anti join.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("aggregation scan prunes columns and uses partial aggregation") {
    val plan = planOf("q1_agg")
    assert(plan.contains("ReadSchema: struct<l_quantity"), "column pruning missing")
    assert(!plan.contains("l_shipdate"), "reads columns the query never touches")
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      "expected two-phase aggregation")
  }

  test("dim filter is pushed into the scan and the small dim broadcasts") {
    val plan = planOf("q2_join3")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "nation should broadcast")
  }

  test("top-K plans as TakeOrderedAndProject, not a global sort") {
    assert(planOf("q8_topk_count").contains("TakeOrderedAndProject"))
    assert(planOf("q10_last_n").contains("TakeOrderedAndProject"))
  }

  test("the UTXO trick is a hash anti join") {
    val plan = planOf("q5_anti_join")
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
  }

  test("block economics never explode or shuffle the box tables") {
    // the per-block sums are nested array folds over the raw rows — the
    // blocks table's plan must contain NO Generate (explode) at all, and
    // its only exchanges are the tiny bucket-offset/window ones, never a
    // box-table aggregation
    import spark.implicits._
    val t = chain.BlockDerivation.derive(
      spark.createDataset(chain.ChainFixture.generate(30)))
    val plan = t.blocks.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"blocks plan must not depend on an exploded table:\n$plan")
    // q31-style sanity: the per-block index bases are fold-derived too
    val gixPlan = t.txs.queryExecution.executedPlan.toString
    assert(!gixPlan.contains("partial_count"),
      s"gix bases must come from array folds, not a tx-row count agg:\n$gixPlan")
  }

  test("IVF probe joins on the bucket key, not a cartesian corpus scan") {
    val plan = planOf("q32_ivf_topk")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "bucket probe must be an equi-join")
  }

  test("snowflake dims broadcast and the part join prunes to the joined columns") {
    val snowflake = planOf("q53_region_rollup")
    assert("BroadcastHashJoin".r.findAllIn(snowflake).length >= 2,
      s"nation and region should both broadcast:\n$snowflake")
    val part = planOf("q52_part_join")
    assert(part.contains("ReadSchema: struct<l_partkey"))
    assert(!part.contains("l_shipdate"), "part join must not read unused lineitem columns")
  }

  test("SemDeDup's pairwise kernel is cluster-keyed — never a cartesian") {
    val plan = planOf("q97_semdedup")
    // the 1-row centroid-array crossJoin (lloydAssign) is the only nested
    // loop allowed; the O(pairs) stage itself must join on the cluster key
    assert(!plan.contains("CartesianProduct"),
      s"q97 must block pairs by cluster id, not all-pairs:\n$plan")
    // two lloydAssign passes ⇒ at most two 1-row nested loops; a third would
    // mean the O(pairs) stage degenerated to an unkeyed join
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 2,
      s"unexpected nested loop beyond the centroid-array broadcasts:\n$plan")
  }

  test("clustered near-dup pairs join on the learned cluster key — never a cartesian") {
    val plan = planOf("q113_clustered_neardup")
    // the Lloyd's passes are checkpointed away before the pair stage, so the
    // executed pair plan must be a pure equi-join on c_id: no nested loop,
    // no cartesian anywhere
    assert(!plan.contains("CartesianProduct"),
      s"q113 must block pairs by learned cluster id:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q113's pair stage degenerated to an unkeyed join:\n$plan")
  }

  test("two-level IVF candidates are g_id equi-joins; pair stage is one c_id exchange") {
    // r09 VERDICT #2: pin q129's scale contract. The UNCUT stage plan
    // (identity lineage cut) exposes the whole candidate pipeline: every
    // join in it must be the g_id equi-join between the probed corpus and
    // the per-group centroid arrays — never a cartesian or nested loop
    // (which would mean the fine-centroid table stopped being
    // group-restricted and degenerated to an all-pairs broadcast).
    val stages = queries.SimilarityQueries
      .ivf2Assigned(spark, sf0001, identity)
    val plan = stages.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"q129 candidate generation must never be a cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q129 must not plan an unkeyed nested loop:\n$plan")
    val joinLines = plan.linesIterator
      .filter(l => l.contains("Join") && !l.contains("ReusedExchange")).toSeq
    assert(joinLines.nonEmpty, s"expected g_id equi-joins in:\n$plan")
    assert(joinLines.forall(_.contains("g_id")),
      s"every candidate join must key on g_id, got:\n${joinLines.mkString("\n")}")
    // the pair tail (after the assignment cut): the shared compiled kernel
    // on ONE hash exchange over the cluster key — no joins at all; the
    // only further exchanges are the distinct + presentation sort
    val pair = planOf("q129_ivf2_neardup")
    assert(!pair.contains("Join"), s"the pair stage must not join:\n$pair")
    assert(pair.contains("MapGroups graft.queries.SimilarityQueries"),
      s"pair stage must be the compiled kernel:\n$pair")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(pair).length
    assert(hashEx <= 2, // kernel grouping + distinct
      s"pair stage grew unexpected shuffles ($hashEx hash exchanges):\n$pair")
  }

  test("staged pair-candidate cluster exchange carries int8 codes, never " +
    "the double vectors (the library two-stage form)") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val assigned = queries.SimilarityQueries.ivf2Assigned(spark, sf0001)
    // AQE hides exchanges behind leaf query stages (and its inputPlan is
    // pre-EnsureRequirements, i.e. exchange-free) — build this one plan
    // with AQE off so the exchanges are plain nodes collect() can see
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tree =
      try queries.SimilarityQueries.neardupCandidates(assigned)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    val exchanges = tree.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.nonEmpty,
      s"expected the kernel-grouping exchange in ${tree.getClass}:\n" +
        tree.treeString)
    exchanges.foreach { e =>
      val doubles = e.output.filter(a => a.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
      assert(doubles.isEmpty,
        s"candidate-stage exchange must not shuffle double arrays, " +
          s"carries: ${doubles.map(_.name).mkString(",")}")
    }
    // and the certified candidates are a SUPERSET of the exact pairs
    // (bound soundness observed in the plan's own output)
    val exact = queries.SimilarityQueries
      .neardupPairsStaged(assigned, queries.SimilarityQueries.ivf2Vecs(spark, sf0001))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candSet = queries.SimilarityQueries.neardupCandidates(assigned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(candSet),
      s"certified candidates must contain every exact pair")
  }

  test("semantic decon probes by (band, code) broadcast equi-join — never SMJ or cartesian") {
    val plan = planOf("q135_semantic_decon")
    assert(!plan.contains("CartesianProduct"),
      s"q135 candidates must come from the banded-code equi-join:\n$plan")
    // allowed nested loops: only the 16-row plane-table broadcasts (one per
    // coding pass); the eval probe join itself must be a broadcast HASH join
    assert(plan.contains("BroadcastHashJoin"),
      s"q135 must broadcast the probe-expanded eval side:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"q135 must never shuffle the corpus against the tiny eval side:\n$plan")
  }

  test("ann recall eval adds only broadcastable joins over its component pipelines") {
    val plan = planOf("q137_ann_recall")
    assert(!plan.contains("CartesianProduct"),
      s"q137's membership probe must stay keyed:\n$plan")
    // the exact side's one intentional BNLJ (q31's broadcast brute force)
    // may appear twice (matched + distinct-q_id branches); the recall join
    // tail itself must be hash-keyed
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      s"q137 recall tail must join on (q_id, nbr_id):\n$plan")
  }

  test("BM25 broadcasts the query/term/stats sides; only tf shuffles") {
    val plan = planOf("q96_bm25")
    // the only nested-loop allowed is the 1-row corpus-stats crossJoin
    // (same convention as q80's doc-count broadcast)
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"df and query-terms joins must broadcast:\n$plan")
  }

  test("substring-dup joins only on the window hash — keyed equi-ops throughout") {
    val plan = planOf("q98_substring_dup")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q98 must stay keyed on the window hash:\n$plan")
  }

  test("decontamination broadcasts the eval-gram surface, never an all-pairs scan") {
    val plan = planOf("q99_decontaminate")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q99 must equi-join on the gram, not compare docs pairwise:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the (benchmark-sized) eval gram set must broadcast:\n$plan")
  }

  test("DSIR's bucket weight table broadcasts; the doc pass stays keyed") {
    val plan = planOf("q101_dsir_weights")
    // the only nested loop allowed is the 1-row corpus-totals crossJoin
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
      s"q101 must broadcast the <=256-row bucket table as a hash join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket weight join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("NB classifier broadcasts the model; scoring is one narrow pass") {
    val plan = planOf("q102_nb_classifier")
    // the only nested loops allowed are 1-ROW broadcasts: the seed-count
    // totals crossJoin and the folded one-row model (langs array) the
    // r15 rewrite scores against in-row — never a row-per-bucket grid
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 2,
      s"q102 may only cross-join 1-row broadcasts:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the fit-side joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // the non-seed token mass must never be exploded through an exchange:
    // no hash partitioning on a bucket column survives in the score path
    assert(!plan.contains("Window"),
      s"argmax must be the in-row array sort, not a window:\n$plan")
  }

  test("image phash pairing is block-keyed equi-joins — never a cartesian") {
    val plan = planOf("q170_image_phash_pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q170 must pair via (block, key) equi-joins:\n$plan")
  }

  test("blocklist dictionary joins as a broadcast, not an isin chain or loop") {
    val plan = planOf("q103_blocklist_filter")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q103 must equi-join grams against the dictionary:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the phrase dictionary must broadcast:\n$plan")
  }

  test("embedding outlier screen broadcasts centroids; corpus never self-joins") {
    val plan = planOf("q104_embedding_outliers")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q104 is centroid-join only — no pairwise corpus comparison:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the label-centroid table must broadcast:\n$plan")
  }

  test("column profile is one corpus pass — a single scan, no per-column rescans") {
    val plan = planOf("q105_column_profile")
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      s"q105 must profile every column from ONE lineitem scan:\n$plan")
    assert(!plan.contains("Join"), s"no joins in a profile pass:\n$plan")
  }

  test("PQ encoding is map-side: codebooks broadcast, corpus never shuffles") {
    val plan = planOf("q107_pq_codes")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"q107 joins only 1-row broadcast codebooks:\n$plan")
  }

  test("split-leakage audit stays on keyed joins over the dup subgraph") {
    val plan = planOf("q110_split_leakage")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q110 joins component labels against a keyed census:\n$plan")
  }

  test("split assignment is one keyed join; the corpus scan reads only doc_id") {
    val plan = planOf("q126_cluster_split")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q126 joins labels by doc_id only:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"q126 must prune the documents scan to doc_id:\n$plan")
  }

  test("clean export composes keyed screens — no pairwise stage anywhere") {
    val plan = planOf("q108_clean_export")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q108 is doc_id equi-joins over linear screens:\n$plan")
  }

  test("simhash pairing is block-keyed equi-joins — never a cartesian") {
    val plan = planOf("q29_simhash_pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q29 must not plan an all-pairs join:\n$plan")
  }

  test("as-of and range joins never plan a nested-loop over the fact table") {
    // q83: union + window — there should be no join at all beyond the
    // pre-aggregation; q84: candidates must come from the (user, bucket)
    // equi-join, not the raw range predicate (which would plan a BNLJ).
    val asof = planOf("q83_asof_join")
    assert(!asof.contains("BroadcastNestedLoopJoin") && !asof.contains("CartesianProduct"),
      s"q83 must not plan an all-pairs join:\n$asof")
    val range = planOf("q84_range_join")
    assert(!range.contains("BroadcastNestedLoopJoin") && !range.contains("CartesianProduct"),
      s"q84 must not plan an all-pairs join:\n$range")
  }

  test("bucketed jaccard is keyed joins only — never a cartesian") {
    val plan = planOf("q59_jaccard_lsh_bucketed")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q59 must not plan an all-pairs join:\n$plan")
  }

  test("flagship chain query plans: anti-join UTXO + broadcast dims, no cartesian") {
    val plan = planOf("q40_chain_boxes_by_address")
    assert(plan.contains("LeftAnti"), s"utxo must stay an anti join:\n$plan")
    // the enrich dims carry NO broadcast hint (they grow with the chain) —
    // AQE must still pick broadcast at RUNTIME here, where the point
    // query's box set and the fixture dims are actually small: assert on
    // the final adaptive plan after execution
    val df = SparkEntry.queries("q40_chain_boxes_by_address")(spark, sf0001)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"AQE should broadcast the small sides at runtime:\n$finalPlan")
    // q37's lineage legitimately contains one BroadcastNestedLoop — the
    // ~100-row triangular bucket-offset join in the derivation — so assert
    // the payback exclusion stays an anti join instead of a blanket ban.
    val graph = planOf("q37_chain_tx_graph")
    assert(graph.contains("LeftAnti"), s"payback exclusion must be an anti join:\n$graph")
  }

  test("decontamination broadcasts the eval shingles; sampling broadcasts strata") {
    val cont = planOf("q67_decontamination")
    assert(cont.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast, not shuffle the corpus:\n$cont")
    assert(!cont.contains("SortMergeJoin"),
      s"corpus side must not sort-merge against the tiny eval side:\n$cont")
    val smp = planOf("q66_stratified_sample")
    assert(smp.contains("BroadcastHashJoin"),
      s"per-stratum counts are a broadcast dim:\n$smp")
    // repetition is per-row: nothing shuffles except the presentation sort
    val rep = planOf("q68_repetition")
    val exchanges = "Exchange".r.findAllIn(rep).length
    assert(exchanges <= 1, s"q68 must be map-side ($exchanges exchanges):\n$rep")
  }

  test("packing window is partitioned; vocab/boilerplate aggregate before ranking") {
    // q69's prefix sum must never be a global window (the A5 anti-pattern)
    val pack = planOf("q69_sequence_packing")
    assert(!pack.contains("Window [") || pack.contains("windowspecdefinition(lang"),
      s"packing window must partition by lang:\n$pack")
    // q70's top-k over gram frequencies is a TakeOrdered, not a global sort
    val boil = planOf("q70_boilerplate_ngrams")
    assert(boil.contains("TakeOrderedAndProject"), s"q70 top-k:\n$boil")
    // q71's rank window must sit ABOVE the vocab aggregation (plan prints
    // root-first, so the Window line appears before the HashAggregate that
    // collapses the corpus) — never a window over raw corpus rows
    val vocab = planOf("q71_vocab_topk")
    val (wIdx, aIdx) = (vocab.indexOf("Window"), vocab.indexOf("HashAggregate"))
    assert(wIdx >= 0 && aIdx >= 0 && wIdx < aIdx,
      s"q71 window must rank aggregated vocab, not corpus rows:\n$vocab")
    // q72 is map-side arithmetic + one tiny aggregate: ≤ 2 exchanges
    val quant = planOf("q72_embedding_quantize")
    val exchanges = "Exchange".r.findAllIn(quant).length
    assert(exchanges <= 2, s"quantization must stay map-side ($exchanges):\n$quant")
  }

  test("k-means assignment broadcasts the centroids — corpus never shuffles to join") {
    val plan = planOf("q73_kmeans_train")
    // round 8: assignment is the compiled broadcast-centroid MapPartitions
    // kernel (centroids ride a broadcast variable, invisible to the plan) —
    // the corpus must never sort-merge-join and the argmin must never be a
    // per-vector rank window (a window would shuffle the whole corpus by
    // vec_id each assignment); the ONLY exchanges allowed are the K-row
    // aggregations after per-partition combining
    assert(plan.contains("MapPartitions graft.queries.SimilarityQueries"),
      s"assignment must be the compiled map-side kernel:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle-join:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window-shuffle the corpus:\n$plan")
  }

  test("q128 probe scoring is a pure scan — learned weights fold as literals") {
    // the trained weights are driver literals, so the held-out scoring
    // plan must contain NO join and NO aggregation: one documents scan,
    // per-row arithmetic, the presentation sort. (Training itself ran at
    // plan-construction: one moments aggregation, nothing pairwise.)
    val plan = planOf("q128_quality_probe")
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"scoring must not aggregate:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id") && plan.contains("text"),
      s"scoring reads doc_id + text only:\n$plan")
  }

  test("balance/rich-list/entropy/tfidf plans keep their scale shape") {
    // q75's running balance must be a partitioned window, never global
    val bal = planOf("q75_balance_history")
    assert(bal.contains("windowspecdefinition(ergoTreeHash"),
      s"balance window must partition by script:\n$bal")
    // q76's as-of reconstruction stays an anti join + top-10 TakeOrdered
    val rich = planOf("q76_rich_list_at_height")
    assert(rich.contains("LeftAnti"), s"as-of UTXO must be an anti join:\n$rich")
    assert(rich.contains("TakeOrderedAndProject"), s"top-10 must TakeOrdered:\n$rich")
    // q78 is per-row column math: nothing shuffles except the final sort
    val ent = planOf("q78_char_entropy")
    val exchanges = "Exchange".r.findAllIn(ent).length
    assert(exchanges <= 1, s"entropy must be map-side ($exchanges exchanges):\n$ent")
    // q80's rank window partitions by doc_id and the doc-count dim broadcasts
    val tfidf = planOf("q80_tfidf_topk")
    assert(tfidf.contains("windowspecdefinition(doc_id"),
      s"tfidf window must partition by doc:\n$tfidf")
    assert(tfidf.contains("BroadcastNestedLoopJoin") || tfidf.contains("BroadcastHashJoin"),
      s"the 1-row doc count must broadcast:\n$tfidf")
  }

  test("warehouse range scan prunes heightBucket partitions at the source") {
    val plan = planOf("q95_wh_range_scan")
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("heightBucket"),
      s"the derived bucket predicate must reach PartitionFilters:\n$plan")
  }

  test("per-doc text pipeline has no shuffle before the final sort") {
    val plan = planOf("q24_fingerprint")
    // one Exchange max (the presentation orderBy) — the md5/split work is map-side
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"text pipeline shuffles too much ($exchanges):\n$plan")
  }

  test("sessionization is one data shuffle: the roll-up reuses the window partitioning") {
    val plan = planOf("q115_sessionize")
    // lag window, running-sum window, and groupBy(user_id, session_ord) must
    // all ride ONE hashpartitioning(user_id) — EnsureRequirements adds no
    // second exchange because the grouping keys contain the window key. The
    // only other allowed exchange is the presentation orderBy's range one.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"sessionize must be a single user_id shuffle ($exchanges hash exchanges):\n$plan")
  }

  test("gram novelty: the gram mass crosses one exchange (min agg), the " +
    "occurrence stream never joins, and the doc join keys on doc_id") {
    val plan = planOf("q116_gram_novelty")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"novelty must stay keyed:\n$plan")
    // r18 restructure: the pre-r18 pin required the gram-keyed JOIN of the
    // occurrence stream against the first_doc aggregate; that join is now
    // GONE by design — novel_grams is a doc-keyed count over the gram-TYPE
    // table and the only join left is the doc_id left join onto the
    // (doc_id, n_grams) pass (Round18Spec pins value-equality to the old
    // form; gramNoveltyJoinForm retains it)
    assert(!("Join \\[g#".r.findFirstIn(plan).isDefined),
      s"the gram-keyed occurrence join must stay gone:\n$plan")
    assert("Join \\[doc_id#".r.findFirstIn(plan).isDefined ||
      plan.contains("Join [doc_id"),
      s"doc join must key on doc_id:\n$plan")
    // first_doc still comes from a real aggregate: partial_min/min(doc_id)
    // under a gram-keyed exchange. The REAL invariant is "a gram exchange
    // exists and the gram join does not" (asserted above) — an exact ==1
    // count was brittle against explain-format changes that legitimately
    // print the same exchange twice (numbered detail sections, AQE reuse),
    // so the count pins ≥ 1 instead (r18 ADVICE).
    assert(plan.contains("min(doc_id"), s"first-doc aggregate missing:\n$plan")
    assert("Exchange hashpartitioning\\(g#".r.findAllIn(plan).size >= 1,
      s"gram min-agg exchange missing:\n$plan")
  }

  test("dup-span coalescing: hash-keyed joins, island window partitioned by doc") {
    val plan = planOf("q117_dup_spans")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q117 must stay keyed on the window hash / doc id:\n$plan")
    // the gaps-and-islands walk must parallelize across docs, never a
    // global single-partition window
    assert(!plan.contains("Window [") ||
      "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan).isEmpty,
      s"island window must be partitioned by doc_id:\n$plan")
  }

  test("OOV probe broadcasts the top-K vocab; the corpus is never reshuffled") {
    val plan = planOf("q118_oov_rate")
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab membership must be a broadcast probe:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q118 must equi-join on the token:\n$plan")
    // the vocab top-K must be distributed TakeOrdered, not a
    // single-partition row_number window over the whole vocabulary
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-K must plan as TakeOrderedAndProject:\n$plan")
  }

  test("quality cube is one scan through Expand — no per-grouping-set rescan") {
    val plan = planOf("q121_quality_cube")
    assert(plan.contains("Expand"), s"CUBE must plan via Expand:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"cube must read the corpus exactly once, saw $scans scans:\n$plan")
  }

  test("containment join stays keyed on the shingle hash — never a cartesian") {
    val plan = planOf("q120_containment")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q120 must generate candidates via the prefix equi-join:\n$plan")
  }

  test("winnowing is pure per-row HOF work — no join, no pre-agg shuffle") {
    val plan = planOf("q119_winnow_fingerprint")
    assert(!plan.contains("Join"), s"q119 must not join anything:\n$plan")
    // the only exchange allowed is the final presentation sort
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"q119 should shuffle at most for the final sort:\n$plan")
  }

  test("line dedup is keyed on the line hash — no window, no cartesian") {
    val plan = planOf("q142_line_dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q142 must equi-join on the line hash:\n$plan")
    assert(!plan.contains("Window"),
      s"first-occurrence must be the encoded-rank min-agg, not a window:\n$plan")
  }

  test("z-order audit folds ranges as literals — one scan, zero joins") {
    val plan = planOf("q144_zorder_layout")
    assert(!plan.contains("Join"), s"q144's audit pass must not join:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"q144's audit is one corpus pass, saw $scans scans:\n$plan")
    assert(plan.contains("partial"), s"bucket rollup must map-side combine:\n$plan")
  }

  test("incremental dedup probes stored band buckets — equi-joins only") {
    val plan = planOf("q145_dedup_incremental")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q145 must probe via band equi-joins:\n$plan")
  }

  test("q160 PMI: TakeOrdered cut; unigram joins broadcast-keyed") {
    val plan = planOf("q160_pmi_collocations")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K collocations must be TakeOrdered, not a global sort:\n$plan")
    // the 1-row totals ride a broadcast CROSS (BNLJ-Cross of a 1-row side
    // is the house pattern); what must never appear is an UNKEYED pairing
    // of two unbounded sides
    assert(!plan.contains("CartesianProduct"),
      s"q160 must never plan a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the c1/c2 unigram joins must be keyed broadcast joins:\n$plan")
  }

  test("q163 source KL: corpus collapses once; pair join keys on the token") {
    val plan = planOf("q163_source_kl")
    // the (sources × head) grid is a broadcast cross of a CONSTANT dim
    // (TakeOrdered head) — fine; a cartesian of unbounded sides is not
    assert(!plan.contains("CartesianProduct"),
      s"q163 must never plan a cartesian:\n$plan")
    // the corpus collapsed into the lineage-cut (source, token) table at
    // construction: the executed plan must not rescan the parquet corpus
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"post-cut plan must not rescan the corpus (saw $scans scans):\n$plan")
  }

  test("q154 threshold fit: every window sits above the bounded sample filter") {
    // the production contract vs q143's rank form: NO window over the
    // corpus-extent score table — the only windows in the plan rank the
    // fixed-size fit sample (doc_id % mod = 0 AND doc_id < max below them),
    // and the fitted thresholds come back as a broadcast join
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
    val qe = SparkEntry.queries("q154_perplexity_thresholds")(spark, sf0001)
      .queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the threshold-fit window")
    windows.foreach { w =>
      val sampleBound = w.child.collect {
        case f: Filter if f.condition.toString.contains(
          graft.queries.TextQueries.PerpSampleMax.toString) => f
      }
      assert(sampleBound.nonEmpty,
        s"a window ranks more than the bounded sample:\n${qe.optimizedPlan}")
    }
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      "thresholds must broadcast back to the corpus side")
  }

  test("q167 heaps law: windows rank only the 8-row checkpoint rollup") {
    // the curve's prefix sums must run over the post-aggregation rollup
    // (≤ 8 rows), never the corpus: every Window's child must contain an
    // Aggregate below it (the per-checkpoint collapse) — the closed-form
    // integer bucketing means there is no corpus×checkpoint join either
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val qe = SparkEntry.queries("q167_heaps_law")(spark, sf0001).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the prefix-sum window")
    windows.foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"window input is not the checkpoint rollup:\n${qe.optimizedPlan}")
    }
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "no corpus-extent cross join")
  }

  test("q168 burstiness head plans as TakeOrderedAndProject") {
    assert(planOf("q168_token_burstiness").contains("TakeOrderedAndProject"))
  }
}
