package graft.queries

import graft.Lineage.LineageCut

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY.md §7.5 —
  * training-data pipeline surface): exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): the only all-pairs computation ever done is within
  * an LSH/band/label bucket — candidate generation is always an equi-join on
  * a derived blocking key (fingerprint, band hash, simhash, label), so the
  * shuffle is keyed and AQE can split skewed buckets. The exact-jaccard
  * verification stage (q26) exists as the within-bucket kernel; the
  * whole-corpus variant here is only run at oracle scale. All hashes are
  * md5-derived (TextFunctions.hash64) so DuckDB reproduces them exactly.
  */
object DedupQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private val NumHashes = 12
  private val NumBands = 3 // 4 rows per band
  private val RowsPerBand = NumHashes / NumBands
  // ADAPTIVE band sharding (the engine's analog of the reference's learned
  // supernode split, mvstore/SuperNodeMvMap.scala:18-248 — skew/saturation
  // handling as a first-class citizen): above BandTargetDocs docs, every
  // band key gains shardBits low bits of a DISCRIMINATOR minhash (the
  // first row of the NEXT band), doubling the key space per bit so
  // band-bucket occupancy stays ~constant as the corpus grows — without
  // it, chance 4-row coincidences on a small effective vocabulary make
  // the candidate mass superlinear (measured: q106 4.8×/decade and q164
  // 6.2×/decade at sf10 on the fixed 3×4 keys). The dial is the standard
  // LSH recall trade: a qualifying pair must also agree on the extra bits
  // (probability ≥ J + (1−J)·2^−bits per band), so recall at the 0.5
  // threshold decays gently while false-candidate mass halves per bit.
  // Both engines derive bits from the SAME count(documents) ladder, so
  // the oracle replays the dial exactly; at or below BandTargetDocs
  // (every oracle-gated scale) bits = 0 and the candidate sets are
  // byte-identical to the fixed-band form.
  private[graft] val BandTargetDocs = 65536L // 2^16: bits=0 through sf1
  private[graft] val MaxShardBits = 12
  private[graft] def bandShardBits(nDocs: Long): Int = {
    var b = 0
    while (b < MaxShardBits && nDocs > (BandTargetDocs << b)) b += 1
    b
  }
  // one footer-cheap count per (session, dir) sizes the dial (q113/q140's
  // bounded-driver-count precedent)
  private val nDocsMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Long]()
  Memos.register(s => nDocsMemo.keys.filter(_._1 eq s)
    .foreach(nDocsMemo.remove))
  private def shardBits(s: SparkSession, dir: String): Int =
    math.min(MaxShardBits,
      bandShardBits(nDocsMemo.getOrElseUpdate((s, dir),
        { Memos.hook(s); docs(s, dir).count() }))
        + auditDial.getOrElse(s, 0))

  // ---- AUDIT-INFORMED dial (r16 verdict item 6 — close the audit→dial
  // loop): the count ladder above is a PRIOR, sized from corpus size
  // alone; BandSkewReport persists what the banding actually COST run
  // over run, and the reference ships/reloads its learned hot-key list
  // rather than re-deriving from theory (SuperNodeCollector.scala:13-65;
  // the ChainIngest.learnedHotKeys pattern here). A deployment calls
  // [[useAuditDial]] once at startup: the latest persisted run's
  // production-tier counters (tier = minhash at its own adaptive bits)
  // are read, and when the measured worst-band pair mass exceeds
  // AuditMassPerDoc pairs per doc — ~3× the linear mass the r14 BandAudit
  // measured at sf10, so a healthy corpus never trips it — the dial gains
  // ⌈log₂(worst/target)⌉ extra bits (each bit halves chance-collision
  // mass), capped at MaxShardBits. The raise is a DEPLOYMENT choice,
  // exactly like learned hot-key salting: the driver/oracle gate never
  // registers an audit dir, so every oracle-bound row replays the pure
  // count ladder unchanged; a session that opts in trades recall for the
  // measured skew (the documented LSH dial semantics). ----
  private[graft] val AuditMassPerDoc = 2L
  private val auditDial =
    scala.collection.concurrent.TrieMap[SparkSession, Int]()
  Memos.register(s => { auditDial.remove(s); () })

  /** Register `auditDir` as this session's learned-dial evidence: reads
    * the LATEST persisted band-audit run once (the learnedHotKeys
    * load-at-start analog — re-register to re-read) and raises every
    * subsequent banding consumer's shard bits by the measured amount.
    * Returns the extra bits chosen (0 = the audit says the prior is
    * fine, or no runs exist yet).
    */
  def useAuditDial(s: SparkSession, auditDir: String): Int = {
    Memos.hook(s)
    val extra = learnedExtraBits(s, auditDir)
    auditDial(s) = extra
    extra
  }

  /** Unregister (spec hook; a fresh session is also unregistered). */
  def clearAuditDial(s: SparkSession): Unit = { auditDial.remove(s); () }

  /** The measured raise: worst production-band pair mass of the latest
    * run vs the linear target. Total, not per-band-average — one hot
    * band is exactly the skew the dial exists to split.
    */
  private[graft] def learnedExtraBits(s: SparkSession, auditDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(auditDir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) return 0
    val runs = try BandSkewReport.runs(s, auditDir)
      .filter(col("run_id").isNotNull)
    catch { // an existing dir with no committed run= leaves yet
      case _: org.apache.spark.sql.AnalysisException => return 0
    }
    // latest run: cadence ids ascend (newest = max ≥ 0); ad-hoc ids
    // DESCEND through the negative namespace (newest = min < 0). A
    // cadence run outranks ad-hoc history — it is the maintenance
    // rhythm's view of the same corpus, and strictly fresher evidence
    // than any one-off a mixed dir may hold.
    val mm = runs.agg(max("run_id"), min("run_id")).collect()(0)
    if (mm.isNullAt(0)) return 0
    val latestId = if (mm.getLong(0) >= 0) mm.getLong(0) else mm.getLong(1)
    val rows = runs
      .filter(col("run_id") === latestId &&
        col("tier") === "minhash" && col("bits") === col("adaptive_bits"))
      .agg(max("pair_mass").as("worst"), max("n_docs").as("n"))
      .collect()(0)
    if (rows.isNullAt(0) || rows.isNullAt(1)) return 0
    val (worst, n) = (rows.getLong(0), rows.getLong(1))
    val target = AuditMassPerDoc * math.max(1L, n)
    if (worst <= target) 0
    else math.min(MaxShardBits,
      64 - java.lang.Long.numberOfLeadingZeros((worst - 1) / target))
  }
  // The EXACT-CENSUS stripe (the q30/q113 law, r14 verdict item 6),
  // shared by q26 (exact Jaccard) and q120 (exact containment): the whole
  // corpus at every oracle/bench scale (doc_id < 5000 covers sf ≤ 0.1
  // entirely, so results there are byte-identical to the pre-stripe
  // form), constant work beyond. Both are RECALL ORACLES for the
  // production paths, not the production dedup itself — symmetric
  // near-dup rides q27/q59's banded LSH and quote/superset detection
  // rides q98's window-hash substring dup, all full-corpus and linear at
  // any scale; the exact censuses exist to measure those paths' recall,
  // and a recall measurement needs a pinned population, not the whole
  // corpus (q120 was the largest absolute entry of the sf10 surface —
  // 41 s of lossless-but-linear candidate verification — before this).
  // Interpolated into the DuckDB oracles so the two engines can never
  // disagree on the population.
  private[graft] val CensusStripeMax = 5000L
  // 64-bit fingerprint (Manku et al.'s width): with 8-bit blocks the
  // blocking key space per band is 256 — candidate volume O(n²/2^8) instead
  // of the O(n²/2^5) a 32-bit hash allows, and the bits come free from the
  // two cached base hashes (no extra md5 per shingle).
  private val SimhashBits = 64
  // pairing threshold: hamming ≤ 7 (empirically ≥0.9 recall of the exact
  // J≥0.5 pairs at this fingerprint width; PipelineSpec pins it)
  private val SimhashMaxHamming = 7
  private val SampleSeed = 66
  // q108 keep-list quality floor (drops the bottom ~7% of the composite
  // q22 score on the synthetic corpus). private[graft]: the q128 probe
  // teacher (TextQueries.ProbeTeacherMin) and StreamCurationBench GATE ON
  // THIS SAME FLOOR — referencing one constant keeps a threshold change
  // from silently desynchronizing them from q108 (r08 ADVICE).
  private[graft] val QualityMin = 0.62
  // q110 eval-split selector (deterministic ~5% stands in for the held-out
  // split being audited).
  private val LeakMod = 20
  private val LeakRes = 7
  private val SamplePerStratum = 50L
  // accept iff u·n_l < Per·2^60 over the FULL 60-bit hash (decimal/HUGEINT
  // arithmetic): a coarser modulus (e.g. %10000) floors the accept rate at
  // 1/modulus, breaking the per-stratum cap once n_l exceeds modulus·Per —
  // exactly the 10^10-doc strata a 100 TB corpus produces.
  private val SampleThreshold: BigInt = BigInt(SamplePerStratum) << 60
  // double-hashing modulus: keeps h0 + 11 * (h1 % Mod) well inside Long.
  private val DoubleHashMod = 1L << 56
  // q126 split-assignment: hash seed + cumulative percent cut points
  // (train < 90, val < 95, test otherwise) over a 0–99 bucket.
  private val SplitSeed = 41
  private val TrainCut = 90
  private val ValCut = 95

  /** Split routing (rep id → train/val/test) — the ONE definition shared by
    * the q126 batch assignment and the streaming assignment view
    * (`StreamingDupClusters.splitAssignments`), so the two surfaces cannot
    * drift on seed or cut points.
    */
  private[graft] def splitOf(repId: Column): Column = {
    val bucket = hash64(repId.cast("string"), SplitSeed) % 100
    when(bucket < TrainCut, "train")
      .when(bucket < ValCut, "val")
      .otherwise("test")
  }

  /** doc_id + distinct 3-gram word shingles + both base hashes, cached per
    * (session, sf dir): q26–q29 all start from this stage — materialized
    * once with the md5 work done, like dedup pipelines persist their
    * shingle table.
    */
  private val shMemo = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => shMemo.keys.filter(_._1 eq s)
    .foreach(k => shMemo.remove(k).foreach(_.unpersist())))
  private def shingledDocs(s: SparkSession, dir: String): DataFrame =
    shMemo.getOrElseUpdate((s, dir), {
      Memos.hook(s)
      graft.functions.WordShinglesExpression.register(s)
      docs(s, dir)
        .select(col("doc_id"), explode(shingles(toks(col("text")), 3)).as("s"))
        // cache ONLY (doc_id, h0, h1c): no consumer reads the 3-word
        // string itself, and dropping it shrinks the cached table ~3× —
        // at 100× bench data the fat form no longer fit storage memory,
        // and its eviction made every consumer re-pay the md5 kernel
        .select(col("doc_id"), hash64(col("s"), 0).as("h0"),
          (hash64(col("s"), 1) % DoubleHashMod).as("h1c"))
        .cache()
    })

  /** doc_id + 60-bit shingle hash — joins/compares on longs, not 3-word
    * strings (≈6× smaller shuffle keys; collisions negligible and identical
    * on the oracle side, which uses the same md5-derived hash).
    */
  private def shingleHashes(s: SparkSession, dir: String): DataFrame =
    shingledDocs(s, dir).select(col("doc_id"), col("h0").as("hs"))

  /** Per-doc-DISTINCT (doc_id, hs) relation for the CANDIDATE side of the
    * exact set-similarity joins (q26/q120), exploded from the cached
    * doc-array layout so the df counts, per-doc ranks, prefix cuts, and
    * positional bounds all see the SAME distinct-set cardinalities as `n`
    * and the set-based verify. With the raw shingle rows, an in-doc 60-bit
    * hash collision would consume a prefix rank slot while `n` counts
    * distinct hashes — which can evict the needed rarest shingle from the
    * prefix and lose a qualifying pair the oracle's full join keeps
    * (r09 ADVICE: the exact collision class the set-based r08 fix claims
    * to close, now closed on both sides). Reads the cached array table —
    * no extra shuffle.
    */
  private def distinctShingleHashes(s: SparkSession, dir: String): DataFrame =
    shingleArrays(s, dir).select(col("doc_id"), explode(col("arr")).as("hs"))

  /** doc_id → (n, distinct shingle-hash ARRAY) — the verify-side layout
    * for the exact set-similarity operators (q26/q59/q120): one doc_id
    * shuffle builds both the size table and the per-doc array, and pair
    * verification becomes a per-row `array_intersect` instead of an
    * exploded three-way join (rows shrink from per-shingle to per-doc).
    * Memoized per (session, sf dir) like the shingle/signature stages —
    * dedup pipelines materialize this table once. ~n longs per doc: bounded
    * by document length, the same order as the signature row.
    */
  private val arrMemo = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => arrMemo.keys.filter(_._1 eq s)
    .foreach(k => arrMemo.remove(k).foreach(_.unpersist())))
  private def shingleArrays(s: SparkSession, dir: String): DataFrame =
    arrMemo.getOrElseUpdate((s, dir), {
      Memos.hook(s)
      // collect_SET + size, not collect_list + count (r08 ADVICE): the
      // shingle strings are distinct per doc, but two distinct shingles
      // can collide into one 60-bit hash — the verify side must then be
      // set-based END TO END (array_intersect dedups, so n and the oracle
      // must count distinct hashes too) or Spark and DuckDB diverge on
      // exactly that doc
      shingleHashes(s, dir).groupBy("doc_id")
        .agg(collect_set(col("hs")).as("arr"))
        .select(col("doc_id"), size(col("arr")).cast("long").as("n"), col("arr"))
        .cache()
    })

  /** MinHash signature via Kirsch–Mitzenmacher double hashing: two md5-based
    * hashes per shingle expand to all NumHashes functions as
    * g_k = h0 + k·(h1 mod 2^56) — same collision behaviour, 6× less md5.
    * Memoized per (session, sf dir): q27 and q59 share one cached signature
    * table, the way real dedup pipelines persist signatures once.
    */
  private val sigMemo = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => sigMemo.keys.filter(_._1 eq s)
    .foreach(k => sigMemo.remove(k).foreach(_.unpersist())))
  private def signatures(s: SparkSession, dir: String): DataFrame =
    sigMemo.getOrElseUpdate((s, dir), {
      Memos.hook(s)
      val mins = (0 until NumHashes)
        .map(k => min(col("h0") + lit(k.toLong) * col("h1c")).as(s"mh$k"))
      shingledDocs(s, dir).groupBy("doc_id").agg(mins.head, mins.tail: _*).cache()
    })

  /** Near-dup component labels (doc_id → cid = min doc_id of its LSH dup
    * component), memoized per (session, sf dir) the way a production
    * pipeline materializes the cluster assignment ONCE and every downstream
    * consumer (clustering report q65, clean export q108, leakage audit
    * q110) reads the same table. Covers only edge-having docs; singletons
    * are self-clusters by definition and each consumer re-adds them as it
    * needs.
    */
  private val labelMemo = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => labelMemo.keys.filter(_._1 eq s)
    .foreach(k => labelMemo.remove(k).foreach(_.unpersist())))
  private def dupLabels(s: SparkSession, dir: String): DataFrame =
    labelMemo.getOrElseUpdate((s, dir), {
      Memos.hook(s)
      val pairs = lshNearDupPairs(signatures(s, dir), shardBits(s, dir))
        .select("a_id", "b_id").cutLineage()
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      graft.functions.Clustering.minLabelComponents(edges)
        .toDF("doc_id", "cid").cache()
    })

  /** Materialize the shared shingle + signature stages (Bench warmup): the
    * cache-population cost is warehouse infrastructure shared by q26–q29 and
    * q59, not any single query's engine time.
    */
  private[graft] def warm(s: SparkSession, dir: String): Unit = {
    shingledDocs(s, dir).count()
    signatures(s, dir).count()
    dupLabels(s, dir).count()
    shingleArrays(s, dir).count()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on the canonical-form fingerprint; keep the
    // lowest doc_id per group. One shuffle on a uniform 128-bit key.
    "q25_exact_dedup" -> ((s, dir) => {
      docs(s, dir)
        .groupBy(md5(normText(col("text"))).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp")
    }),

    // QUALITY-AWARE keeper selection: production dedup keeps the BEST copy
    // of each duplicate family (highest quality score, doc_id tie-break),
    // not the lowest id. Families here key on the BAG fingerprint (q24's
    // fp_bag: same distinct-token set, any order/multiplicity) — members
    // share content but differ in repetition and stopword load, so the
    // quality rule genuinely picks. One shuffle on the fingerprint; the
    // keeper pick is a family-partitioned window (families are small, so
    // the window parallelizes across them).
    "q122_best_copy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = toks(col("text"))
      val scored = docs(s, dir).select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tk)))).as("fp"),
        round(qualityScore(tk), 9).as("q"))
      val counts = scored.groupBy("fp").agg(count(lit(1)).as("n_copies"))
      val w = Window.partitionBy("fp").orderBy(col("q").desc, col("doc_id"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(counts, "fp")
        .select(col("fp"), col("doc_id").as("keep_id"), col("n_copies"),
          round(col("q"), 4).as("best_quality"))
        .orderBy("fp")
    }),

    // n-gram Jaccard near-dup, EXACT, via prefix filtering (the set-
    // similarity-join literature's lossless candidate pruning): order each
    // doc's shingles by global rarity (df asc, hash asc — a consistent total
    // order), keep only the first |A| − ⌈t·|A|⌉ + 1 of them, and equi-join
    // prefixes. Theorem: J(A,B) ≥ t ⇒ the smallest shared element (in the
    // global order) sits within both prefixes, so no qualifying pair is
    // lost. Hot shingles stop exploding the join because a frequent shingle
    // is almost never among a doc's *rarest* elements — the k² blow-up that
    // killed the naive shared-shingle join lands only on genuinely rare
    // (low-df) keys. Exact intersections are then counted only for
    // candidate pairs.
    "q26_shingle_jaccard" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the q30/q113 STRIPE LAW applied to the exact-recall shingle census
      // (r14 verdict item 6): the exact all-qualifying-pairs form exists as
      // the recall oracle for the LSH production path (q27/q59 ride the
      // full corpus), so it runs on a FIXED doc_id stripe — the whole
      // corpus at every oracle/bench scale (sf ≤ 0.1 has doc_id < 5000),
      // constant work beyond. Shingle rarity (df) is computed within the
      // stripe: the stripe IS the census population, exactly as q30's
      // pinned stripe is its own distance population.
      val stripe = col("doc_id") < CensusStripeMax
      val sh = distinctShingleHashes(s, dir).filter(stripe)
      val arrs = shingleArrays(s, dir).filter(stripe)
      val sz = arrs.select("doc_id", "n")
      val dfreq = sh.groupBy("hs").agg(count(lit(1)).as("df"))
      // rank within doc by (df, hs); prefix p = n − ceil(0.5·n) + 1.
      val ranked = sh.join(dfreq, "hs")
        .withColumn("r", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "hs")))
        .join(sz, "doc_id")
        .filter(col("r") <= col("n") - ceil(col("n") * 0.5) + 1)
      // singletons (df=1) consume prefix slots but can never match across
      // docs — drop them from the join input (still lossless).
      val pf = ranked.filter(col("df") >= 2).select("doc_id", "hs", "r", "n")
      // positional filter (PPJoin): a match at ranks (ra, rb) bounds the
      // overlap by 1 + min(na−ra, nb−rb); J ≥ t needs overlap ≥
      // ⌈t/(1+t)·(na+nb)⌉, and the smallest shared element always satisfies
      // the bound — so pruning matches below it is lossless and cuts the
      // verify-join input several-fold.
      val alpha = ceil((col("a.n") + col("b.n")) * lit(0.5) / lit(1.5))
      // length filter (lossless): J ≤ min(na,nb)/max(na,nb), so J ≥ 0.5
      // forces max ≤ 2·min — pairs outside the size band never qualify and
      // are pruned IN the prefix join, before the distinct and the verify
      // join ever see them (the superlinear dup-mass term lives there).
      val cand = pf.as("a")
        .join(pf.as("b"), col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
        .filter(col("a.n") <= col("b.n") * 2 && col("b.n") <= col("a.n") * 2)
        .filter(lit(1) + least(col("a.n") - col("a.r"), col("b.n") - col("b.r")) >= alpha)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      exactJaccard(cand, arrs)
    }),

    // MinHash + LSH: 12 md5-derived min-hashes per doc, banded 3×4; docs
    // sharing any band hash become candidates; estimated Jaccard = fraction
    // of matching signature rows ≥ 0.5. The scale path for q26: candidate
    // generation is 3 equi-joins on 128-bit band keys — no all-pairs stage.
    "q27_minhash_lsh" -> ((s, dir) => {
      lshNearDupPairs(signatures(s, dir), shardBits(s, dir))
        .select(col("a_id"), col("b_id"), round(col("est_j"), 4).as("est_j"))
        .orderBy("a_id", "b_id")
    }),

    // The 100 TB production shape for n-gram dedup: exact Jaccard evaluated
    // ONLY within MinHash-LSH candidate buckets — candidate generation is
    // banded equi-joins (q27), verification is keyed joins on (doc, shingle
    // hash); no stage is all-pairs. Trades bounded recall (an LSH miss is a
    // missed pair) for linear scaling; q26 is the exact-recall form.
    "q59_jaccard_lsh_bucketed" -> ((s, dir) => {
      val cand = lshCandidatePairs(signatures(s, dir), shardBits(s, dir))
      exactJaccard(cand, shingleArrays(s, dir))
    }),

    // CONTAINMENT join (asymmetric Jaccard, C(A,B) = |A∩B|/|A| ≥ 0.8):
    // catches quote/near-superset relationships symmetric Jaccard misses —
    // a short doc embedded in a long one scores high containment but low
    // Jaccard. Candidates via the containment prefix filter: any B
    // containing ≥ ⌈t·|A|⌉ of A's shingles shares at least one of A's
    // k = |A| − ⌈t·|A|⌉ + 1 RAREST shingles (it can miss at most k−1 of A
    // overall), so only those k join — and a prefix singleton (df=1) can
    // never be the shared one, so dropping it stays lossless. The DuckDB
    // oracle recomputes ground truth from the FULL pair join, independently
    // verifying the filter's losslessness. All integer arithmetic (the
    // threshold is the cross-multiplied 5·shared ≥ 4·n).
    "q120_containment" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // the same CENSUS-STRIPE law as q26 (see CensusStripeMax): the
      // exact containment census is the recall oracle for quote/superset
      // detection — q98's window-hash substring dup is the full-corpus
      // linear production path — so it runs on the pinned stripe (the
      // whole corpus at every oracle/bench scale, constant beyond; df
      // within the stripe)
      val stripe = col("doc_id") < CensusStripeMax
      val sh = distinctShingleHashes(s, dir).filter(stripe)
      val arrs = shingleArrays(s, dir).filter(stripe)
      val sz = arrs.select("doc_id", "n")
      val dfreq = sh.groupBy("hs").agg(count(lit(1)).as("df"))
      // ONE ranked table (global (df, hs) total order within each doc)
      // feeds both join sides — the a-side prefix-restricts it, the b-side
      // keeps every shingle but carries its rank so the positional filter
      // can prune AT MATCH TIME; Catalyst's exchange reuse computes the
      // ranking once.
      val ranked = sh.join(dfreq, "hs")
        .withColumn("r", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "hs")))
        .join(sz, "doc_id")
      val pre = ranked
        .filter(col("r") <= col("n") - expr("(n*4 + 4) div 5") + 1)
        .filter(col("df") >= 2)
        .select(col("doc_id").as("a_id"), col("hs"),
          col("r").as("r_a"), col("n").as("n_a"))
      val bside = ranked.select(col("doc_id").as("b_id"), col("hs"),
        col("r").as("r_b"), col("n").as("n_b"))
      // Both prunes run INSIDE the prefix join, before the distinct where
      // the superlinear dup-mass term lives (round 7 measured the distinct
      // over raw candidate pairs as the residual sf1 cost):
      //  - length filter (lossless): shared ≤ n_b and C ≥ 0.8 force
      //    5·n_b ≥ 4·n_a — the container is at least 80% of A's size;
      //  - positional filter (lossless, the PPJoin bound proven on q26):
      //    for the SMALLEST shared element at ranks (r_a, r_b), every
      //    shared element ranks ≥ it in both docs, so shared ≤
      //    1 + min(n_a − r_a, n_b − r_b); C ≥ 0.8 needs shared ≥
      //    ⌈0.8·n_a⌉, and the smallest shared element (always in A's
      //    prefix with df ≥ 2, else the pair can't qualify) satisfies the
      //    bound — pruning the matches below it loses no qualifying pair.
      val alpha = expr("(n_a*4 + 4) div 5")
      val cand = pre
        .join(bside, "hs")
        .filter(col("a_id") =!= col("b_id"))
        .filter(col("n_b") * 5 >= col("n_a") * 4)
        .filter(lit(1) + least(col("n_a") - col("r_a"),
          col("n_b") - col("r_b")) >= alpha)
        .select("a_id", "b_id").distinct()
      // verify in the doc-array layout (same round-8 move as exactJaccard):
      // two doc_id equi-joins + one per-pair array_intersect replace the
      // exploded three-way join + groupBy count that dominated at 10× data
      cand
        .join(arrs.select(col("doc_id").as("a_id"), col("n").as("n_a"),
          col("arr").as("aa")), "a_id")
        .join(arrs.select(col("doc_id").as("b_id"), col("arr").as("ab")), "b_id")
        .withColumn("shared",
          size(array_intersect(col("aa"), col("ab"))).cast("long"))
        .filter(col("shared") * 5 >= col("n_a") * 4)
        .select(col("a_id"), col("b_id"), col("n_a"), col("shared"),
          round(col("shared").cast("double") / col("n_a"), 4).as("containment"))
        .orderBy("a_id", "b_id")
    }),

    // Corpus-governance dup provenance: WHERE do the near-dups come from?
    // q27's LSH near-dup pairs mapped onto their sources and rolled up into
    // a symmetric source×source pair-count matrix (the report that decides
    // which crawls/dumps to drop or down-weight). Adds only two keyed
    // doc_id joins and a (bounded: sources²) aggregation on top of the
    // linear-scaling LSH pipeline — no new pairwise stage.
    "q106_source_dup_matrix" -> ((s, dir) => {
      val src = docs(s, dir).select(col("doc_id"), col("source"))
      lshNearDupPairs(signatures(s, dir), shardBits(s, dir))
        .join(src.select(col("doc_id").as("a_id"), col("source").as("sa")), "a_id")
        .join(src.select(col("doc_id").as("b_id"), col("source").as("sb")), "b_id")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    }),

    // SimHash: 32-bit locality-sensitive fingerprint — per bit, sign of the
    // ±1 vote sum across shingle hashes. One groupBy per doc; near-dups land
    // within small hamming distance of each other.
    "q28_simhash" -> ((s, dir) => {
      simhashed(s, dir).orderBy("doc_id")
    }),

    // SimHash pairing: hamming ≤ SimhashMaxHamming via multi-block banding
    // (Manku et al.'s exact trick): split the 64 bits into 8 blocks —
    // ≤ 7 differing bits cannot touch all 8 blocks, so every qualifying
    // pair shares at least one whole block. Candidates come from 8
    // equi-joins on 8-bit block keys (keyed shuffles, NO cartesian/
    // BroadcastNestedLoop anywhere), then the true hamming distance is
    // verified. Result-identical to all-pairs.
    "q29_simhash_pairs" -> ((s, dir) => {
      val sim = simhashed(s, dir)
      // ONE self-join on the exploded (block index, block key) pair instead
      // of six separate joins — a single shuffle stage. Hamming is verified
      // inside the join, so only the handful of rows passing the threshold
      // reach the distinct; the candidate mass (band collisions) never
      // survives a shuffle boundary.
      val keyed = sim.select(col("doc_id"), col("simhash"),
        posexplode(array(SimhashBlocks.map { case (off, w) =>
          shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1))
        }: _*)).as(Seq("blk", "bk")))
      keyed.as("a")
        .join(keyed.as("b"),
          col("a.blk") === col("b.blk") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .filter(col("hamming") <= SimhashMaxHamming)
        .distinct()
        .orderBy("a_id", "b_id")
    }),

    // THE SKEW AUDIT AS A FIRST-CLASS ORACLE-BOUND QUERY (r15 verdict item
    // 1, hardened): the counters BandSkewReport persists on the
    // maintenance cadence — MinHash band-bucket occupancy/pair-mass at
    // bits ∈ {0, adaptive} plus the q29 simhash 8-bit Hamming-block tier
    // with its degenerate-key quarantine count — recomputed end to end by
    // DuckDB (band md5s, the sb dial ladder, the simhash bit votes, the
    // (h >> 8b) & 255 block keys, integer pair mass). The audit that
    // guards the banding tiers is itself value-verified, not just
    // spec-shaped.
    "q171_hamming_skew_audit" -> ((s, dir) =>
      BandSkewReport.report(s, dir).orderBy("tier", "bits", "band")),

    // Dedup clustering: connected components over the MinHash-LSH near-dup
    // pairs (q27's est_j ≥ 0.5 graph), so a dup GROUP collapses to ONE
    // canonical doc even when similarity is only transitive (A~B, B~C but
    // A≁C). Pregel-style min-label propagation: every superstep is one keyed
    // join (edges ⋈ labels) + one groupBy-min — no cartesian, no driver-side
    // graph. Supersteps = component diameter, which for near-dup clusters is
    // tiny (dups of one source text), and each superstep localCheckpoints so
    // lineage stays O(1). At 100 TB the same loop runs with edges/labels as
    // bucketed tables; the alternating small-star/large-star variant halves
    // superstep count if diameters ever grow.
    "q65_dedup_clusters" -> ((s, dir) => {
      // the SAME pair set q27 reports, clustered ONCE (memoized dupLabels —
      // the superstep kernel iterates only over edge-having nodes, so every
      // superstep shuffles O(edges), not O(corpus)). Edge-free docs are
      // singleton clusters by definition and rejoin after convergence.
      val labels = dupLabels(s, dir)
      // singletons: cluster = self. NO broadcast hint on the label side: the
      // dup subgraph is corpus-dependent (web crawls run 30%+ duplicate), so
      // a forced broadcast is a driver-OOM risk at scale — AQE broadcasts it
      // at runtime whenever it actually is small.
      val full = docs(s, dir).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
      // cluster sizes via a cluster-partitioned window — one shuffle on
      // cluster_id and the corpus pass runs ONCE (the groupBy+join-back
      // alternative evaluates `full` twice and re-plans the label join under
      // AQE on both sides)
      full
        .withColumn("csize", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .select(col("doc_id"), col("cluster_id"), col("csize"))
        .orderBy("doc_id")
    }),

    // Split-leakage audit: train docs whose near-dup CLUSTER contains an
    // eval doc — the held-out split is worthless for exactly these docs
    // (their paraphrase is in the eval set even when no direct pair crosses
    // the boundary, hence clusters, not pairs). Reuses the q65 component
    // machinery; the report joins component labels against the per-cluster
    // eval census — keyed joins only, sized by the dup subgraph.
    "q110_split_leakage" -> ((s, dir) => {
      val labels = dupLabels(s, dir)
      val isEval = col("doc_id") % LeakMod === LeakRes
      val evalCensus = labels.filter(isEval)
        .groupBy("cid").agg(count(lit(1)).as("n_eval"))
      labels.filter(!isEval)
        .join(evalCensus, "cid")
        .select(col("doc_id"), col("cid").as("cluster_id"), col("n_eval"))
        .orderBy("doc_id")
    }),

    // Leakage-FREE split assignment — the constructive twin of q110's audit.
    // Every doc routes to train/val/test by hashing its dup-cluster
    // REPRESENTATIVE (q65's component label; singletons represent
    // themselves), so an entire near-dup family lands in ONE split by
    // construction and the q110 audit of this assignment is empty by
    // definition. The bucket is the same md5-derived deterministic hash the
    // sampler (q66) uses — stable under retries and incremental re-runs,
    // never rand(). Cost: the memoized label table plus one broadcast-free
    // doc_id equi-join; the corpus itself is scanned once and never
    // reshuffled, so the stage is O(scan) at any corpus size.
    "q126_cluster_split" -> ((s, dir) => {
      docs(s, dir).select("doc_id")
        .join(dupLabels(s, dir), Seq("doc_id"), "left")
        .withColumn("rep_id", coalesce(col("cid"), col("doc_id")))
        .withColumn("split", splitOf(col("rep_id")))
        .select("doc_id", "rep_id", "split")
        .orderBy("doc_id")
    }),

    // DEDUP THRESHOLD-SENSITIVITY CURVE — the dial study you read BEFORE
    // fixing the near-dup threshold (q27/q65 fix est-J ≥ 0.5): the
    // histogram of LSH candidate pairs by minhash match count k, with the
    // cumulative pairs-at-or-above column — n_pairs_at_or_above(k) IS the
    // dup-pair count the pipeline would act on at threshold k/NumHashes,
    // so the curve shows exactly how much dedup each threshold notch
    // buys. Scale shape: the candidate kernel is the SAME banded equi-
    // join every LSH consumer rides; the histogram is ≤ NumHashes+1 rows
    // and the cumulative window runs over that constant.
    "q164_dedup_threshold_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sig = signatures(s, dir)
      val eqCount = (0 until NumHashes)
        .map(k => when(col(s"sa.mh$k") === col(s"sb.mh$k"), 1).otherwise(0))
        .reduce(_ + _)
      lshCandidatePairs(sig, shardBits(s, dir))
        .join(sig.as("sa"), col("a_id") === col("sa.doc_id"))
        .join(sig.as("sb"), col("b_id") === col("sb.doc_id"))
        .select(eqCount.cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_pairs_at_or_above",
          sum("n_pairs").over(Window.orderBy(col("k").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("k")
    }),

    // CROSS-SPLIT LINE LEAKAGE — the contamination metric at the C4 line
    // granularity: how many of each held-out split's distinct lines ALSO
    // appear in train (q67/q99 catch gram-span overlap per doc; q110
    // flags whole leaked docs; this counts the verbatim line units the
    // dedup pipeline itself operates on, over the SAME newline-aware
    // geometry as q142). A high leak_frac on val/test means the
    // cluster-aware split (q126) is routing around doc-level dedup but
    // boilerplate still crosses the fence. Scale shape: the line mass
    // collapses to distinct (split, h) in one pass; the train probe is an
    // h-keyed equi-join of two distinct line sets; rollup is ≤ 2 rows.
    // (optimization r18, measured and REJECTED: folding the two join arms
    // into one h-keyed collect_set(split) + per-row membership expansion —
    // "one line-mass shuffle instead of the distinct planned twice" —
    // measured SLOWER at every scale, interleaved min-of-5/3 in one JVM:
    // sf1 1.84 → 2.33 s, sf1z 1.81 → 2.22 s, sf10 8.55 → 9.65 s. The two
    // "duplicated" arms run as PARALLEL stages of one job (the q102
    // one-pass-fit lesson), while collect_set pays a per-line Set
    // allocation in an ObjectHashAggregate that cannot whole-stage-codegen
    // — the distinct+join form stays.)
    "q162_split_line_leakage" -> ((s, dir) => {
      val splits = queries("q126_cluster_split")(s, dir)
        .select("doc_id", "split")
      val sl = graft.queries.TextQueries.docLines(
          docs(s, dir).select("doc_id", "text"))
        .join(splits, "doc_id")
        .select("split", "h").distinct()
      val trainH = sl.filter(col("split") === "train").select("h")
      sl.filter(col("split") =!= "train")
        .join(trainH.withColumn("hit", lit(1L)), Seq("h"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_lines"),
          sum(coalesce(col("hit"), lit(0L))).as("n_leaked"))
        .withColumn("leak_frac",
          round(col("n_leaked").cast("double") / col("n_lines"), 6))
        .orderBy("split")
    }),

    // Corpus-side SQL surface (the LLM-pipeline twin of q123): the split ×
    // keep-reason census ROUTED THROUGH spark.sql over the mounted
    // CorpusSurface views — verifying a plain-SQL user of the pipeline
    // verdict tables gets oracle-identical results with no Scala facade.
    // Mounted once per session (temp views persist), like a SQL user
    // registering the surface at connect time; the timed work is the query.
    "q127_corpus_sql" -> ((s, dir) => {
      CorpusSurface.mount(s, dir)
      s.sql("""
        SELECT sp.split, c.reason, count(1) AS n_docs
        FROM corpus_splits sp JOIN corpus_clean c ON sp.doc_id = c.doc_id
        GROUP BY sp.split, c.reason
        ORDER BY sp.split, c.reason""")
    }),

    // The TERMINAL pipeline stage: materialize the cleaned-corpus keep list.
    // Composes the already-linear screens into ONE declarative plan — exact
    // dedup (md5 canonical-form groups), near-dup clustering (q65's
    // connected components over the LSH pair graph; the cluster label IS
    // the canonical min doc_id), the q103 phrase blocklist, and the q22
    // quality floor — and reports per doc: keep + the FIRST rule that fired
    // (fixed priority, so the report is deterministic and auditable). Every
    // rule is keyed on doc_id; the composition adds four doc_id equi-joins
    // and nothing pairwise, so the export costs what its screens cost.
    "q108_clean_export" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      // rule 1: exact-duplicate non-keepers
      val fp = d.select(col("doc_id"), md5(normText(col("text"))).as("fp"))
      val exact = fp.join(fp.groupBy("fp").agg(min("doc_id").as("keeper")), "fp")
        .select(col("doc_id"), (col("doc_id") =!= col("keeper")).as("is_exact"))
      // rule 2: near-dup non-canonicals (the shared memoized label table)
      val labels = dupLabels(s, dir)
      // rule 3: blocklist hits (the shared q103 gram/dictionary shape)
      val base = d.select(col("doc_id"), toks(col("text")).as("tk"))
      val blocked = base.select(col("doc_id"), explode(col("tk")).as("g"))
        .unionAll(base.select(col("doc_id"), explode(bigrams(col("tk"))).as("g")))
        .join(broadcast(TextQueries.Blocklist.toDF("g")), "g")
        .select("doc_id").distinct()
        .withColumn("is_blocked", lit(true))
      // rule 4: quality floor (the shared q22 composite, identical
      // rounding), computed off the tokens already projected for rule 3
      val qual = base.select(col("doc_id"),
        round(qualityScore(col("tk")), 4).as("q"))
      d.select("doc_id")
        .join(exact, "doc_id")
        .join(labels, Seq("doc_id"), "left")
        .join(blocked, Seq("doc_id"), "left")
        .join(qual, "doc_id")
        .withColumn("reason",
          when(col("is_exact"), "exact_dup")
            .when(col("cid").isNotNull && col("cid") =!= col("doc_id"), "near_dup")
            .when(col("is_blocked"), "blocklist")
            .when(col("q") < QualityMin, "quality")
            .otherwise("kept"))
        .withColumn("keep", (col("reason") === "kept").cast("int"))
        .select("doc_id", "keep", "reason")
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: flag corpus docs sharing ≥ 2 n-gram
    // shingles with a held-out eval set (here: the deterministic doc_id %
    // 100 == 7 slice stands in for the benchmark suite). The eval side's
    // distinct shingle hashes are tiny relative to the corpus — broadcast
    // them, so the corpus side is ONE map-side hash-join pass over the
    // shingle table with no shuffle of corpus data; only the per-doc overlap
    // counts aggregate. This is the contamination-removal stage every
    // training-data pipeline runs before a model sees the corpus.
    "q67_decontamination" -> ((s, dir) => {
      val sh = shingleHashes(s, dir)
      val bench = sh.filter(col("doc_id") % 100 === 7).select("hs").distinct()
      sh.filter(col("doc_id") % 100 =!= 7)
        .join(broadcast(bench), "hs")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling: cap each language stratum at ~Per
    // docs by thresholding an md5-derived uniform hash — the sample is a
    // pure function of doc_id (stable under retries, re-partitioning, and
    // incremental re-runs, unlike rand()-based sampling). The accept test is
    // exact integer arithmetic (u·n_l < Per·2^60 ⟺ u/2^60 < Per/n_l) in
    // decimal, so no float rounding can disagree across engines and the cap
    // holds at any stratum size (see SampleThreshold). Stratum counts are a
    // broadcast dim; the scan itself is one pass, no shuffle of the data.
    "q66_stratified_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      val counts = d.groupBy("lang").agg(count(lit(1)).as("nl"))
      d.join(broadcast(counts), "lang")
        .withColumn("u", hash64(col("doc_id").cast("string"), SampleSeed))
        .filter(col("u").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          col("nl") < lit(new java.math.BigDecimal(SampleThreshold.bigInteger)))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-dup: same-label blocking (the IVF bucket analog)
    // then pairwise cosine ≥ 0.4 in double precision. Blocking key join →
    // keyed shuffle, never a global cross join. STRIPE-BOUNDED (r13 verdict
    // item 2 — the q113 rule): this is the exact-recall diagnostic
    // companion of q31/q129/q130; fixed `label` blocking makes its pair
    // kernel quadratic per label at corpus scale, so beyond bench scale it
    // runs on the same fixed id stripe q113 uses (at and below sf0.1 the
    // stripe covers the whole corpus — oracle semantics unchanged) while
    // the production twins ride the full corpus at n·√K.
    "q30_embedding_neardup" -> ((s, dir) => {
      // norms are precomputed per vector (not per pair): the pairwise kernel
      // is then one native vec_dot, a 3× flop cut on the O(pairs) stage.
      graft.functions.DotProductExpression.register(s)
      val e = embs(s, dir)
        .filter(col("vec_id") < SimilarityQueries.NearDupStripeMax)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("n", l2NormNative(col("v")))
      e.as("a")
        .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", dotNative(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")))
        .filter(round(col("cos"), 4) >= 0.4)
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          round(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    }),

    // Dedup ROI report — the "what did near-dup dedup buy us" deliverable
    // every curation run publishes: the family-size HISTOGRAM of the dup
    // clusters plus the REMOVABLE token mass per size class (tokens of
    // every non-canonical member). Reads the memoized q65 cluster labels
    // (the materialize-once table all downstream consumers share) joined
    // to per-doc token counts — one doc_id equi-join + two map-side-
    // combined aggs, the histogram is ≤ max-family-size rows.
    "q147_dedup_roi" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("nt"))
      val fam = d.join(dupLabels(s, dir), Seq("doc_id"), "left")
        .withColumn("cid", coalesce(col("cid"), col("doc_id")))
        .groupBy("cid")
        .agg(count(lit(1)).as("family_size"),
          sum(when(col("doc_id") =!= col("cid"), col("nt"))
            .otherwise(0L)).as("dup_tokens"))
      fam.groupBy("family_size")
        .agg(count(lit(1)).as("n_families"),
          sum("family_size").as("n_docs"),
          sum("dup_tokens").as("dup_tokens"))
        .orderBy("family_size")
    }),

    // PER-SOURCE DEDUP ATTRIBUTION — which source carries the duplicate
    // load, at THREE dedup strengths: exact (canonical text), token
    // MULTISET (order-insensitive — shuffled-token re-posts), and
    // distinct-token SET (q24's fp_bag strength — template docs differing
    // only in repetition). Each strength's dup count is monotone in the
    // previous (exact ≤ bag ≤ set; a spec law). Keep-first semantics with
    // NO join-back: each fingerprint group folds to its min (doc_id,
    // source) struct in one map-side-combined agg, so "source X's dups" =
    // its docs minus the first-occurrences it owns — the q142
    // owner-attribution trick at doc granularity. Three 8-byte-keyed aggs
    // over the corpus + |sources|-row joins; nothing rescans, nothing
    // joins corpus × corpus.
    "q155_dedup_attribution" -> ((s, dir) => {
      val tk = toks(col("text"))
      val d = docs(s, dir).select(col("doc_id"), col("source"),
        hash64(normText(col("text")), ExactAttrSeed).as("ex"),
        hash64(concat_ws(" ", sort_array(tk)), BagAttrSeed).as("bg"),
        hash64(concat_ws(" ", array_sort(array_distinct(tk))), SetAttrSeed)
          .as("st"))
      def firstsBy(key: String, out: String) = d.groupBy(col(key))
        .agg(min(struct(col("doc_id"), col("source"))).as("m"))
        .groupBy(col("m").getField("source").as("source"))
        .agg(count(lit(1)).as(out))
      d.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .join(firstsBy("ex", "ex_firsts"), Seq("source"), "left")
        .join(firstsBy("bg", "bg_firsts"), Seq("source"), "left")
        .join(firstsBy("st", "st_firsts"), Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          (col("n_docs") - coalesce(col("ex_firsts"), lit(0L)))
            .as("exact_dups"),
          (col("n_docs") - coalesce(col("bg_firsts"), lit(0L)))
            .as("bag_dups"),
          (col("n_docs") - coalesce(col("st_firsts"), lit(0L)))
            .as("set_dups"))
        .orderBy("source")
    }),

    // DATASET CARD — the per-source datasheet a curated corpus publishes
    // (Datasheets-for-Datasets shape): docs, tokens, language breadth,
    // near-dup rate (non-canonical members of the memoized q65 families),
    // and the mean quality score as an INTEGER floor-div of the quantized
    // per-doc composite (order-independent at any partitioning — the
    // house rule for cross-row double means). One doc_id equi-join + one
    // ~20-key map-side-combined rollup; every input is an
    // already-oracle-checked operator's table.
    "q151_dataset_card" -> ((s, dir) => {
      val tk = toks(col("text"))
      val d = docs(s, dir).select(col("doc_id"), col("source"), col("lang"),
        size(tk).cast("long").as("nt"),
        floor(qualityScore(tk) * 1e6).cast("long").as("qq"))
      d.join(dupLabels(s, dir), Seq("doc_id"), "left")
        .withColumn("isDup",
          (coalesce(col("cid"), col("doc_id")) =!= col("doc_id")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          countDistinct("lang").as("n_langs"),
          sum("isDup").as("dup_docs"),
          expr("sum(qq) div count(1)").as("quality_q6"))
        .withColumn("dup_rate",
          round(col("dup_docs").cast("double") / col("n_docs"), 6))
        .select("source", "n_docs", "n_tokens", "n_langs", "dup_docs",
          "dup_rate", "quality_q6")
        .orderBy("source")
    }),

    // INCREMENTAL dedup — a new batch screened against the EXISTING corpus
    // (the arrival-time shape StreamingDedup/StreamingNearDup run with
    // state; this is the batch form with a full oracle). "New" docs
    // (doc_id ≡ IncrRes mod IncrMod) probe the stored band buckets of the
    // rest of the corpus: any shared band is a candidate, est-Jaccard over
    // the shared signatures decides drop/keep. Scale shape: the corpus
    // side is the PERSISTED banded signature table (built once, q130's
    // train-once/serve-many economics) and the probe is NumBands keyed
    // equi-joins sized by the new batch — cost per increment is
    // O(batch · bucket occupancy), never a corpus rescan, and never
    // corpus × corpus.
    "q145_dedup_incremental" -> ((s, dir) => {
      val sig = signatures(s, dir)
      val banded = bandedSig(sig, shardBits(s, dir))
      val isNew = col("doc_id") % IncrMod === IncrRes
      val newB = banded.filter(isNew)
      val oldB = banded.filter(!isNew)
      val cand = (0 until NumBands).map { b =>
        newB.as("a").join(oldB.as("b"), col(s"a.band$b") === col(s"b.band$b"))
          .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id"))
      }.reduce(_ unionByName _).distinct()
      val eqCount = (0 until NumHashes)
        .map(k => when(col(s"sa.mh$k") === col(s"sb.mh$k"), 1).otherwise(0))
        .reduce(_ + _)
      val verdicts = cand
        .join(sig.as("sa"), col("new_id") === col("sa.doc_id"))
        .join(sig.as("sb"), col("old_id") === col("sb.doc_id"))
        .select(col("new_id"),
          (eqCount * 2 >= NumHashes).cast("long").as("isDup"))
        .groupBy("new_id")
        .agg(count(lit(1)).as("n_candidates"), sum("isDup").as("n_dups"))
      docs(s, dir).filter(isNew).select("doc_id")
        .join(verdicts, col("doc_id") === col("new_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          coalesce(col("n_dups"), lit(0L)).as("n_dups"),
          when(coalesce(col("n_dups"), lit(0L)) > 0, lit("drop"))
            .otherwise(lit("keep")).as("verdict"))
        .orderBy("doc_id")
    })
  )

  /** q145: the "new arrivals" slice — doc_id ≡ IncrRes (mod IncrMod). */
  private val IncrMod = 5
  private val IncrRes = 3
  // q155 fingerprint seeds (exact / multiset / distinct-set strengths must
  // never alias)
  private val ExactAttrSeed = 155
  private val BagAttrSeed = 156
  private val SetAttrSeed = 158

  /** 8-block layout over the 64-bit simhash: (bit offset, width). Hamming
    * ≤ SimhashMaxHamming (= blocks − 1) ⇒ some block is untouched
    * (pigeonhole), so block-equality joins are a lossless candidate
    * generator.
    */
  private val SimhashBlocks: Seq[(Int, Int)] = {
    val nBlocks = SimhashMaxHamming + 1
    val w = SimhashBits / nBlocks
    (0 until nBlocks).map(i => (i * w, w))
  }

  /** Diagnostics for the adaptive band dial (the K6 hot-key-report analog:
    * measure the skew before turning the dial): candidate-pair count and
    * band-bucket occupancy at an explicit bits setting. Driver-side use
    * only (graft.BandAudit); the counts are the SCALEPROOF evidence that
    * sizes BandTargetDocs.
    */
  private[graft] def candidatePairs(s: SparkSession, dir: String,
    bits: Int): DataFrame =
    lshCandidatePairs(signatures(s, dir), bits)
  private[graft] def candidatePairCount(s: SparkSession, dir: String,
    bits: Int): Long =
    candidatePairs(s, dir, bits).count()
  private[graft] def bucketOccupancy(s: SparkSession, dir: String,
    bits: Int): DataFrame = {
    val banded = bandedSig(signatures(s, dir), bits)
    (0 until NumBands).map { b =>
      banded.select(lit(b).as("band"), col(s"band$b").as("key"))
    }.reduce(_ unionByName _)
      .groupBy("band", "key").agg(count(lit(1)).as("occ"))
      .groupBy("band")
      // integer `div`, not `/`: double division loses exactness above ~2^53
      // total pair mass, against the deterministic-integer-numerics house
      // rule (r14 ADVICE) — occ·(occ−1) is always even, so div 2 is exact
      .agg(count(lit(1)).as("n_buckets"), max("occ").as("max_occ"),
        sum(expr("(occ * (occ - 1)) div 2")).as("pair_mass"))
      .orderBy("band")
  }

  /** Near-dup pairs with est_j ≥ 0.5 (q27's pair set) — shared by q27 and
    * q65 so the clusters are exactly the components of the reported graph.
    */
  private def lshNearDupPairs(sig: DataFrame, bits: Int): DataFrame = {
    val eqCount = (0 until NumHashes)
      .map(k => when(col(s"sa.mh$k") === col(s"sb.mh$k"), 1).otherwise(0))
      .reduce(_ + _)
    lshCandidatePairs(sig, bits)
      .join(sig.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sig.as("sb"), col("b_id") === col("sb.doc_id"))
      .withColumn("est_j", eqCount.cast("double") / NumHashes)
      .filter(col("est_j") >= 0.5)
      .select("a_id", "b_id", "est_j")
  }

  /** doc_id + NumBands md5 band keys from a signature table — the bucket
    * layout every LSH consumer (q27/q59 pair generation, q145's
    * new-vs-corpus probe) joins on. `bits` (from [[bandShardBits]]) folds
    * the adaptive shard — the discriminator minhash's low bits — INTO each
    * band md5, so every consumer inherits the dial through plain key
    * equality; at bits = 0 the shard term is the constant ",0" and the
    * equality classes are exactly the fixed 3×4 bands'.
    */
  private def bandedSig(sig: DataFrame, bits: Int): DataFrame = {
    val mod = lit(1L << bits)
    val bandCols = (0 until NumBands).map { b =>
      val ms = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))
      val disc = col(s"mh${((b + 1) * RowsPerBand) % NumHashes}") % mod
      md5(concat_ws(",", (ms :+ disc): _*)).as(s"band$b")
    }
    sig.select(col("doc_id") +: bandCols: _*)
  }

  /** LSH candidate pairs (a_id < b_id, distinct) from banded signatures —
    * shared by q27 (estimated-J verify) and q59 (exact-J verify).
    */
  private def lshCandidatePairs(sig: DataFrame, bits: Int): DataFrame = {
    val banded = bandedSig(sig, bits)
    (0 until NumBands).map { b =>
      banded.as("a")
        .join(banded.as("b"),
          col(s"a.band$b") === col(s"b.band$b") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    }.reduce(_ unionByName _).distinct()
  }

  /** Exact |A∩B|/|A∪B| ≥ 0.5 over candidate pairs only, verified in the
    * DOC-ARRAY layout ([[shingleArrays]]): two doc_id equi-joins attach
    * each side's shingle-hash array, and the intersection is one codegen'd
    * `array_intersect` per pair — cost is Σ_candidates |A|, never corpus².
    * (Round 8: replaced the exploded three-way join + groupBy count, whose
    * per-shingle rows made the verify stage the dominant shuffle at 10×
    * data — the array form moves the same Σ|A| work out of the shuffle and
    * into per-row columnar compute.)
    */
  private def exactJaccard(cand: DataFrame, arrs: DataFrame): DataFrame =
    cand
      .join(arrs.select(col("doc_id").as("a_id"), col("n").as("na"),
        col("arr").as("aa")), "a_id")
      .join(arrs.select(col("doc_id").as("b_id"), col("n").as("nb"),
        col("arr").as("ab")), "b_id")
      .withColumn("c", size(array_intersect(col("aa"), col("ab"))).cast("long"))
      .withColumn("j", col("c").cast("double") / (col("na") + col("nb") - col("c")))
      .filter(col("j") >= 0.5)
      .select(col("a_id"), col("b_id"), round(col("j"), 4).as("jaccard"))
      .orderBy("a_id", "b_id")

  /** doc_id → 32-bit simhash over distinct 3-gram shingles. */
  private[queries] def simhashed(s: SparkSession, dir: String): DataFrame = {
    // 64 vote bits from the two ALREADY-CACHED base hashes — bits 0–31 from
    // h0's low bits, 32–63 from h1c's (independent md5 seeds) — so the
    // fingerprint costs zero fresh md5 per shingle.
    def bitOf(k: Int): Column =
      if (k < 32) shiftright(col("h0"), k).bitwiseAND(1)
      else shiftright(col("h1c"), k - 32).bitwiseAND(1)
    val votes = (0 until SimhashBits).map(k =>
      sum(when(bitOf(k) === 1, 1).otherwise(-1)).as(s"v$k"))
    val sim = (0 until SimhashBits)
      .map(k => when(col(s"v$k") >= 0, lit(1L << k)).otherwise(lit(0L)))
      .reduce(_ + _)
    shingledDocs(s, dir)
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sim.as("simhash"))
  }

  // ---- oracle SQL (DuckDB dialect), generated from the same constants ----

  // ONE tokenization definition for every dedup oracle — the optional
  // WHERE is how the census-stripe oracles (q26/q120) pin their
  // population without copying the gram expression (r15 review finding:
  // an inlined duplicate could silently drift from the shared form)
  private def tkCteWhere(where: String) =
    raw"tk AS (SELECT doc_id, string_split_regex(trim(text),'\s+') AS t FROM documents" +
      (if (where.isEmpty) ")" else s" $where)")
  private val tkCte = tkCteWhere("")
  private def tkCteStriped =
    tkCteWhere(s"WHERE doc_id < $CensusStripeMax")
  private val shCte =
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1), " +
      "i -> array_to_string(t[i:i+2], ' ')))) AS s FROM tk)"

  private val minsSql =
    (0 until NumHashes)
      .map(k => s"min(${hash64Sql("s", 0)} + $k * (${hash64Sql("s", 1)} % $DoubleHashMod)) AS mh$k")
      .mkString(", ")
  /** The shard-bits dial as a DuckDB scalar CTE — the SAME
    * count(documents) ladder [[bandShardBits]] walks, so the two engines
    * can never disagree on the dial (exact integer comparisons on both
    * sides; no float log2 whose boundary rounding could diverge).
    */
  private val sbCte = {
    val ladder = (0 until MaxShardBits)
      .map(i => s"WHEN n <= ${BandTargetDocs << i} THEN $i").mkString(" ")
    s"sb AS (SELECT CASE $ladder ELSE $MaxShardBits END AS bits " +
      "FROM (SELECT count(*) AS n FROM documents))"
  }
  private val bandsSql = (0 until NumBands).map { b =>
    val ms = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}")
    val disc = s"mh${((b + 1) * RowsPerBand) % NumHashes}"
    s"md5(${ms.mkString(" || ',' || ")} || ',' || " +
      s"CAST($disc % (CAST(1 AS BIGINT) << bits) AS VARCHAR)) AS band$b"
  }.mkString(", ")
  private val pairUnionsSql = (0 until NumBands).map { b =>
    s"SELECT a.doc_id a_id, b.doc_id b_id FROM banded a JOIN banded b " +
      s"ON a.band$b = b.band$b AND a.doc_id < b.doc_id"
  }.mkString(" UNION ")
  private val eqSql = (0 until NumHashes)
    .map(k => s"(CASE WHEN sa.mh$k = sb.mh$k THEN 1 ELSE 0 END)").mkString(" + ")

  /** The near-dup component-labeling CTE chain (signatures → banded LSH
    * candidates → est-J ≥ 0.5 pairs → doubled edges → recursive min-label
    * reachability → `lab(doc_id, cluster_id)`, singletons self-labeled).
    * ONE definition shared by every oracle that consumes cluster labels
    * (q65, q108, q110, q126) so a threshold or reach-semantics change can
    * never diverge them. Callers must open with `WITH RECURSIVE $tkCte,
    * $shCte,` before splicing this in.
    */
  private val labCtes =
    s"""sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         pairs AS ($pairUnionsSql),
         jp AS (SELECT a_id, b_id FROM pairs
           JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id
           WHERE ($eqSql) >= ${NumHashes / 2}),
         edges AS (SELECT a_id s, b_id d FROM jp
           UNION ALL SELECT b_id, a_id FROM jp),
         reach(node, lbl) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node),
         lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY 1)"""

  /** q108's screen chain — exact-dup keeper, blocklist grams, quality floor,
    * then the per-doc first-rule-fired verdict `r(doc_id, reason)`. Shared
    * by the q108 export oracle and the q127 SQL-surface roll-up; splice
    * after `$labCtes`.
    */
  private val cleanCtes = {
    val terms = TextQueries.Blocklist.map(t => s"'$t'").mkString(", ")
    s"""fp AS (SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
           FROM documents),
         ex AS (SELECT f.doc_id, f.doc_id <> k.keeper AS is_exact
                FROM fp f JOIN (SELECT fp, min(doc_id) AS keeper
                                FROM fp GROUP BY 1) k USING (fp)),
         g AS (SELECT doc_id, unnest(t) AS g FROM tk
               UNION ALL
               SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> array_to_string(t[i:i+1], ' '))) AS g
               FROM tk WHERE len(t) >= 2),
         bl AS (SELECT DISTINCT doc_id FROM g
                WHERE g IN ($terms)),
         q AS (SELECT doc_id,
             round(0.5 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t)) +
               0.5 * (1.0 - CAST(len(list_filter(t, x -> x IN ('the', 'a'))) AS DOUBLE)
                 / len(t)), 4) AS q
           FROM tk),
         r AS (SELECT d.doc_id,
             CASE WHEN ex.is_exact THEN 'exact_dup'
                  WHEN lab.cluster_id <> d.doc_id THEN 'near_dup'
                  WHEN bl.doc_id IS NOT NULL THEN 'blocklist'
                  WHEN q.q < $QualityMin THEN 'quality'
                  ELSE 'kept' END AS reason
           FROM documents d
           JOIN ex USING (doc_id) JOIN lab USING (doc_id)
           LEFT JOIN bl USING (doc_id) JOIN q USING (doc_id))"""
  }

  /** q126's split bucket over `lab` + the cut-point CASE — shared by the
    * q126 assignment oracle and the q127 SQL-surface roll-up.
    */
  private val splitCte =
    s"""b AS (SELECT doc_id, cluster_id AS rep_id,
           (${hash64Sql("CAST(cluster_id AS VARCHAR)", SplitSeed)}) % 100 AS bk
           FROM lab)"""
  private val splitCaseSql =
    s"CASE WHEN bk < $TrainCut THEN 'train' WHEN bk < $ValCut THEN 'val' ELSE 'test' END"

  // bit weights as precomputed Long literals: 1L << 63 is Long.MinValue and
  // must reach DuckDB as a value — `1::BIGINT << 63` would signed-overflow.
  // Ascending k keeps every partial sum of the + chain inside BIGINT.
  private val simBitsSql = (0 until SimhashBits).map { k =>
    val src =
      if (k < 32) s"(${hash64Sql("s", 0)} >> $k)"
      else s"((${hash64Sql("s", 1)} % $DoubleHashMod) >> ${k - 32})"
    s"(CASE WHEN sum(CASE WHEN $src & 1 = 1 " +
      s"THEN 1 ELSE -1 END) >= 0 THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)"
  }.mkString(" + ")
  private val simCte =
    s"WITH $tkCte, $shCte, sim AS (SELECT doc_id, $simBitsSql AS simhash FROM sh GROUP BY doc_id)"

  val oracles: Map[String, String] = Map(
    "q25_exact_dedup" ->
      raw"""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY fp""",
    "q122_best_copy" ->
      raw"""WITH sc AS (SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS fp,
             round(0.5 * (CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk))
               + 0.5 * (1.0 - CAST(len(list_filter(tk, t -> t IN ('the', 'a')))
                   AS DOUBLE) / len(tk)), 9) AS q
           FROM (SELECT doc_id, text,
                   string_split_regex(trim(text), '\s+') AS tk FROM documents)),
         cnt AS (SELECT fp, count(*) AS n_copies FROM sc GROUP BY 1),
         keep AS (SELECT fp, doc_id, q FROM sc
                  QUALIFY row_number() OVER (PARTITION BY fp
                    ORDER BY q DESC, doc_id) = 1)
         SELECT k.fp, k.doc_id AS keep_id, c.n_copies,
           round(k.q, 4) AS best_quality
         FROM keep k JOIN cnt c USING (fp) ORDER BY k.fp""",
    "q26_shingle_jaccard" ->
      // the stripe predicate replays on the raw table (same constant the
      // Spark side filters on), so the census population is pinned on both
      // engines — at oracle scale (≤ sf0.1) it selects every doc
      s"""WITH $tkCteStriped, $shCte,
         shh AS (SELECT DISTINCT doc_id, ${hash64Sql("s", 0)} AS hs FROM sh),
         sz AS (SELECT doc_id, count(*) n FROM shh GROUP BY 1),
         shared AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c FROM shh a
           JOIN shh b ON a.hs = b.hs AND a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT a_id, b_id, round(CAST(c AS DOUBLE)/(sa.n + sb.n - c), 4) AS jaccard
         FROM shared JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= 0.5
         ORDER BY a_id, b_id""",
    "q120_containment" ->
      // same stripe replay as q26 — the census population is pinned
      s"""WITH $tkCteStriped, $shCte,
         shh AS (SELECT DISTINCT doc_id, ${hash64Sql("s", 0)} AS hs FROM sh),
         sz AS (SELECT doc_id, count(*) n FROM shh GROUP BY 1),
         shared AS (SELECT a.doc_id a_id, b.doc_id b_id, count(*) c
           FROM shh a JOIN shh b ON a.hs = b.hs AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, sa.n AS n_a, c AS shared,
           round(CAST(c AS DOUBLE) / sa.n, 4) AS containment
         FROM shared JOIN sz sa ON sa.doc_id = a_id
         WHERE c * 5 >= sa.n * 4
         ORDER BY a_id, b_id""",
    "q27_minhash_lsh" ->
      s"""WITH $tkCte, $shCte,
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         pairs AS ($pairUnionsSql)
         SELECT a_id, b_id, round(($eqSql) / 12.0, 4) AS est_j
         FROM pairs JOIN sig sa ON sa.doc_id = a_id JOIN sig sb ON sb.doc_id = b_id
         WHERE ($eqSql) / 12.0 >= 0.5
         ORDER BY a_id, b_id""",
    "q106_source_dup_matrix" ->
      s"""WITH $tkCte, $shCte,
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         pairs AS ($pairUnionsSql),
         np AS (SELECT a_id, b_id
                FROM pairs JOIN sig sa ON sa.doc_id = a_id
                           JOIN sig sb ON sb.doc_id = b_id
                WHERE ($eqSql) / 12.0 >= 0.5)
         SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b, count(*) AS n_pairs
         FROM np JOIN documents da ON da.doc_id = np.a_id
                 JOIN documents db ON db.doc_id = np.b_id
         GROUP BY 1, 2 ORDER BY source_a, source_b""",
    "q28_simhash" ->
      s"""$simCte SELECT doc_id, simhash FROM sim ORDER BY doc_id""",
    "q171_hamming_skew_audit" -> {
      val mhUnion = (0 until NumBands)
        .map(b => s"SELECT bits, $b AS band, band$b AS key FROM banded")
        .mkString(" UNION ALL ")
      s"""WITH $tkCte, $shCte,
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         nd AS (SELECT count(*) AS n_docs FROM documents),
         bvals AS (SELECT DISTINCT bits FROM
           (SELECT 0 AS bits UNION ALL SELECT bits FROM sb)),
         banded AS (SELECT doc_id, bv.bits, $bandsSql FROM sig, bvals bv),
         mhocc AS (SELECT bits, band, key, count(*) AS occ
                   FROM ($mhUnion) GROUP BY 1, 2, 3),
         mhrep AS (SELECT 'minhash' AS tier, CAST(bits AS INTEGER) AS bits,
             CAST(band AS INTEGER) AS band, count(*) AS n_buckets,
             max(occ) AS max_occ,
             CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS pair_mass,
             CAST(0 AS BIGINT) AS n_quarantined
           FROM mhocc GROUP BY mhocc.bits, band),
         sim AS (SELECT doc_id, $simBitsSql AS simhash FROM sh GROUP BY doc_id),
         sq AS (SELECT CAST(count(*) FILTER (WHERE simhash = 0 OR simhash = -1)
             AS BIGINT) AS nq FROM sim),
         sk AS (SELECT CAST(t.blk AS INTEGER) AS band,
                  (simhash >> CAST(t.blk * 8 AS INTEGER)) & 255 AS key
                FROM sim, range(0, 8) t(blk)
                WHERE simhash <> 0 AND simhash <> -1),
         socc AS (SELECT band, key, count(*) AS occ FROM sk GROUP BY 1, 2),
         blks AS (SELECT CAST(blk AS INTEGER) AS band FROM range(0, 8) t(blk)),
         srep AS (SELECT 'simhash' AS tier, CAST(0 AS INTEGER) AS bits,
             b.band, CAST(coalesce(x.nb, 0) AS BIGINT) AS n_buckets,
             CAST(coalesce(x.mx, 0) AS BIGINT) AS max_occ,
             CAST(coalesce(x.pm, 0) AS BIGINT) AS pair_mass,
             (SELECT nq FROM sq) AS n_quarantined
           FROM blks b LEFT JOIN (
             SELECT band, count(*) AS nb, max(occ) AS mx,
               CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS pm
             FROM socc GROUP BY band) x ON b.band = x.band),
         pph AS (SELECT mediaId, ${MultimodalQueries.phashBitsSql} AS phash
           FROM read_parquet('${ChainOracle.p("media_phash")}')),
         pq AS (SELECT CAST(count(*) FILTER (WHERE phash = 0 OR phash = -1)
             AS BIGINT) AS nq FROM pph),
         pk AS (SELECT CAST(t.blk AS INTEGER) AS band,
                  (phash >> CAST(t.blk * 8 AS INTEGER)) & 255 AS key
                FROM pph, range(0, 8) t(blk)
                WHERE phash <> 0 AND phash <> -1),
         pocc AS (SELECT band, key, count(*) AS occ FROM pk GROUP BY 1, 2),
         prep AS (SELECT 'phash' AS tier, CAST(0 AS INTEGER) AS bits,
             b.band, CAST(coalesce(x.nb, 0) AS BIGINT) AS n_buckets,
             CAST(coalesce(x.mx, 0) AS BIGINT) AS max_occ,
             CAST(coalesce(x.pm, 0) AS BIGINT) AS pair_mass,
             (SELECT nq FROM pq) AS n_quarantined
           FROM blks b LEFT JOIN (
             SELECT band, count(*) AS nb, max(occ) AS mx,
               CAST(sum((occ * (occ - 1)) // 2) AS BIGINT) AS pm
             FROM pocc GROUP BY band) x ON b.band = x.band)
         SELECT tier, bits, band, n_buckets, max_occ, pair_mass,
           n_quarantined, (SELECT n_docs FROM nd) AS n_docs,
           (SELECT CAST(bits AS INTEGER) FROM sb) AS adaptive_bits
         FROM (SELECT * FROM mhrep UNION ALL SELECT * FROM srep
               UNION ALL SELECT * FROM prep)
         ORDER BY tier, bits, band"""
    },
    "q29_simhash_pairs" ->
      s"""$simCte
         SELECT a.doc_id a_id, b.doc_id b_id,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
         FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming
         ORDER BY a_id, b_id""",
    "q59_jaccard_lsh_bucketed" ->
      s"""WITH $tkCte, $shCte,
         shh AS (SELECT DISTINCT doc_id, ${hash64Sql("s", 0)} AS hs FROM sh),
         sz AS (SELECT doc_id, count(*) n FROM shh GROUP BY 1),
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         pairs AS ($pairUnionsSql),
         inter AS (SELECT p.a_id, p.b_id, count(*) c FROM pairs p
           JOIN shh xa ON xa.doc_id = p.a_id
           JOIN shh xb ON xb.doc_id = p.b_id AND xa.hs = xb.hs
           GROUP BY 1, 2)
         SELECT a_id, b_id, round(CAST(c AS DOUBLE)/(sa.n + sb.n - c), 4) AS jaccard
         FROM inter JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         WHERE CAST(c AS DOUBLE)/(sa.n + sb.n - c) >= 0.5
         ORDER BY a_id, b_id""",
    "q65_dedup_clusters" ->
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         cs AS (SELECT cluster_id, count(*) AS csize FROM lab GROUP BY 1)
         SELECT lab.doc_id, lab.cluster_id, cs.csize
         FROM lab JOIN cs USING (cluster_id) ORDER BY doc_id""",
    "q110_split_leakage" ->
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         ec AS (SELECT cluster_id, count(*) AS n_eval FROM lab
                WHERE doc_id % $LeakMod = $LeakRes GROUP BY 1)
         SELECT lab.doc_id, lab.cluster_id, ec.n_eval
         FROM lab JOIN ec USING (cluster_id)
         WHERE lab.doc_id % $LeakMod <> $LeakRes
         ORDER BY lab.doc_id""",
    "q126_cluster_split" ->
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         $splitCte
         SELECT doc_id, rep_id, $splitCaseSql AS split
         FROM b ORDER BY doc_id""",

    "q164_dedup_threshold_curve" ->
      s"""WITH $tkCte, $shCte,
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         pairs AS ($pairUnionsSql),
         km AS (SELECT CAST(($eqSql) AS BIGINT) AS k
           FROM pairs JOIN sig sa ON sa.doc_id = a_id
             JOIN sig sb ON sb.doc_id = b_id),
         h AS (SELECT k, count(*) AS n_pairs FROM km GROUP BY k)
         SELECT k, n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY k DESC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_pairs_at_or_above
         FROM h ORDER BY k""",

    "q162_split_line_leakage" -> {
      val lineHash = hash64Sql("array_to_string(lt, ' ')", 142)
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         $splitCte,
         ${graft.queries.TextQueries.lineCtesSql("", "l")},
         lh AS (SELECT doc_id, ($lineHash) AS h FROM lix),
         sl AS (SELECT DISTINCT $splitCaseSql AS split, h
           FROM lh JOIN b USING (doc_id)),
         th AS (SELECT h FROM sl WHERE split = 'train')
         SELECT split, count(*) AS n_lines,
           CAST(sum(CASE WHEN th.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaked,
           round(CAST(sum(CASE WHEN th.h IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*), 6) AS leak_frac
         FROM sl LEFT JOIN th ON sl.h = th.h
         WHERE split <> 'train'
         GROUP BY split ORDER BY split"""
    },
    "q127_corpus_sql" ->
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         $cleanCtes,
         $splitCte
         SELECT $splitCaseSql AS split, r.reason, count(*) AS n_docs
         FROM b JOIN r USING (doc_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q108_clean_export" ->
      s"""WITH RECURSIVE $tkCte, $shCte,
         $labCtes,
         $cleanCtes
         SELECT doc_id, CASE WHEN reason = 'kept' THEN 1 ELSE 0 END AS keep,
           reason
         FROM r ORDER BY doc_id""",
    "q67_decontamination" ->
      s"""WITH $tkCte, $shCte,
         shh AS (SELECT doc_id, ${hash64Sql("s", 0)} AS hs FROM sh),
         b AS (SELECT DISTINCT hs FROM shh WHERE doc_id % 100 = 7)
         SELECT doc_id, count(*) AS n_shared FROM shh JOIN b USING (hs)
         WHERE doc_id % 100 <> 7 GROUP BY 1 HAVING count(*) >= 2
         ORDER BY doc_id""",
    "q66_stratified_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS nl FROM documents GROUP BY 1),
         u AS (SELECT doc_id, d.lang,
           CAST(${hash64Sql("CAST(doc_id AS VARCHAR)", SampleSeed)} AS HUGEINT) AS u, nl
           FROM documents d JOIN c USING (lang))
         SELECT doc_id, lang FROM u
         WHERE u * nl < $SampleThreshold ORDER BY doc_id""",
    "q30_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
           FROM embeddings
           WHERE vec_id < ${SimilarityQueries.NearDupStripeMax})
         SELECT a.vec_id a_id, b.vec_id b_id,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4
         ORDER BY a_id, b_id""",
    "q147_dedup_roi" ->
      raw"""WITH RECURSIVE $tkCte, $shCte, $labCtes,
         d AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         fam AS (SELECT cluster_id,
             count(*) AS family_size,
             CAST(sum(CASE WHEN d.doc_id <> cluster_id THEN nt ELSE 0 END)
               AS BIGINT) AS dup_tokens
           FROM d JOIN lab ON lab.doc_id = d.doc_id
           GROUP BY cluster_id)
         SELECT family_size, count(*) AS n_families,
           CAST(sum(family_size) AS BIGINT) AS n_docs,
           CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens
         FROM fam GROUP BY family_size ORDER BY family_size""",

    "q155_dedup_attribution" -> {
      val exH = hash64Sql(
        raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')", ExactAttrSeed)
      val bgH = hash64Sql(
        raw"array_to_string(list_sort(string_split_regex(trim(text), '\s+')), ' ')",
        BagAttrSeed)
      val stH = hash64Sql(
        raw"array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ')",
        SetAttrSeed)
      raw"""WITH d AS (SELECT doc_id, source,
             ($exH) AS ex, ($bgH) AS bg, ($stH) AS st FROM documents),
         ps AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
         exf AS (SELECT source, count(*) AS ex_firsts FROM
             (SELECT arg_min(source, doc_id) AS source FROM d GROUP BY ex)
           GROUP BY source),
         bgf AS (SELECT source, count(*) AS bg_firsts FROM
             (SELECT arg_min(source, doc_id) AS source FROM d GROUP BY bg)
           GROUP BY source),
         stf AS (SELECT source, count(*) AS st_firsts FROM
             (SELECT arg_min(source, doc_id) AS source FROM d GROUP BY st)
           GROUP BY source)
         SELECT ps.source AS source, n_docs,
           CAST(n_docs - coalesce(ex_firsts, 0) AS BIGINT) AS exact_dups,
           CAST(n_docs - coalesce(bg_firsts, 0) AS BIGINT) AS bag_dups,
           CAST(n_docs - coalesce(st_firsts, 0) AS BIGINT) AS set_dups
         FROM ps LEFT JOIN exf ON ps.source = exf.source
           LEFT JOIN bgf ON ps.source = bgf.source
           LEFT JOIN stf ON ps.source = stf.source
         ORDER BY ps.source"""
    },

    "q151_dataset_card" ->
      raw"""WITH RECURSIVE $tkCte, $shCte, $labCtes,
         d AS (SELECT doc_id, source, lang,
             CAST(len(tk2) AS BIGINT) AS nt,
             CAST(floor((0.5 * (len(list_distinct(tk2)) / CAST(len(tk2) AS DOUBLE))
               + 0.5 * (1.0 - len(list_filter(tk2, t -> t IN ('the', 'a')))
                 / CAST(len(tk2) AS DOUBLE))) * 1000000.0) AS BIGINT) AS qq
           FROM (SELECT doc_id, source, lang,
                   string_split_regex(trim(text), '\s+') AS tk2
                 FROM documents)),
         j AS (SELECT d.*,
             CASE WHEN lab.cluster_id <> d.doc_id THEN 1 ELSE 0 END AS isDup
           FROM d JOIN lab ON lab.doc_id = d.doc_id)
         SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(isDup) AS BIGINT) AS dup_docs,
           round(CAST(sum(isDup) AS DOUBLE) / count(*), 6) AS dup_rate,
           CAST(sum(qq) // count(*) AS BIGINT) AS quality_q6
         FROM j GROUP BY source ORDER BY source""",

    "q145_dedup_incremental" -> {
      val probeUnions = (0 until NumBands).map { b =>
        s"SELECT a.doc_id AS new_id, b.doc_id AS old_id FROM banded a " +
          s"JOIN banded b ON a.band$b = b.band$b " +
          s"AND a.doc_id % $IncrMod = $IncrRes AND b.doc_id % $IncrMod <> $IncrRes"
      }.mkString(" UNION ")
      s"""WITH $tkCte, $shCte,
         sig AS (SELECT doc_id, $minsSql FROM sh GROUP BY doc_id),
         $sbCte,
         banded AS (SELECT doc_id, $bandsSql FROM sig, sb),
         cand AS ($probeUnions),
         v AS (SELECT new_id, count(*) AS n_candidates,
             CAST(sum(CASE WHEN ($eqSql) * 2 >= $NumHashes THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dups
           FROM cand
           JOIN sig sa ON sa.doc_id = new_id
           JOIN sig sb ON sb.doc_id = old_id
           GROUP BY new_id)
         SELECT d.doc_id,
           CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(n_dups, 0) AS BIGINT) AS n_dups,
           CASE WHEN coalesce(n_dups, 0) > 0 THEN 'drop' ELSE 'keep' END AS verdict
         FROM documents d LEFT JOIN v ON v.new_id = d.doc_id
         WHERE d.doc_id % $IncrMod = $IncrRes
         ORDER BY d.doc_id"""
    }
  )
}
