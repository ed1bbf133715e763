package graft.queries

import graft.Lineage.LineageCut

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §7.5): exact
  * brute-force cosine top-k as the correctness baseline, and an IVF
  * (inverted-file) bucketed variant as the 100 TB scale path.
  *
  * Scale design: the query set is broadcast (it is small by definition), so
  * brute force is a map-side nested loop over corpus splits + a top-k
  * (TakeOrdered-style) per query — no corpus shuffle. The IVF variant
  * replaces the full scan with (a) a tiny broadcast centroid table, (b) a
  * map-side nearest-centroid assignment, (c) an equi-join on bucket id —
  * probing 1/K of the corpus per query.
  */
object SimilarityQueries extends QueryModule {

  private val NumQueries = 5
  private val TopK = 10
  private val NProbe = 3
  private val NumPlanes = 6 // hyperplane-LSH code width (64 buckets)
  private val KMeansK = 8   // q73 Lloyd's training cluster count
  private val SemDedupTau = 0.35 // q97 within-cluster near-dup threshold
  private val CoresetPct = 40    // q146: % of each cluster kept (ceil, ≥1)
  private val NearDupTau = 0.4   // q113 pair threshold (q30's, for the recall law)
  private val NearDupProbes = 2  // q113 multi-probe width (clusters per vector)
  // q113's fixed diagnostic stripe: the whole corpus at bench scale
  // (sf ≤ 0.1), a constant-work sample beyond it
  private[graft] val NearDupStripeMax = 5000L
  // q113 blocking-K target: K = max(KMeansK, n / NearDupClusterSize), so the
  // expected cluster stays ~constant as the corpus grows and the
  // within-cluster pairwise kernel stays LINEAR in n (fixed K would make it
  // quadratic: 10x vectors -> 100x pairs — observed 13.4x wall at sf1 in r05
  // before this). The oracle replays the same formula from count(*).
  private val NearDupClusterSize = 250L
  // q129 two-level IVF: vectors pre-select CoarseProbes of the G = ceil(√K)
  // coarse groups, then probe only the fine centroids inside them — the
  // assign stage drops from n·K to n·(G + CoarseProbes·K/G) ≈ n·√K flops,
  // and only the G coarse centroids ever reach the driver.
  private val CoarseProbes = 3
  private val OutlierK = 5  // q104 least-prototypical vectors flagged per label
  // q135 semantic decontamination: every DeconEvery-th vector is the held-out
  // "benchmark" set; corpus vectors within DeconTau cosine of any benchmark
  // vector are contamination and must be dropped before training. A filter
  // whose job is catching leakage needs HIGH recall at a weak threshold
  // (cos 0.3 ≈ 72°), where q50's single 6-bit band collides only ~20% of
  // true pairs — so this path uses AND-OR banding (MinHash-LSH's scheme on
  // hyperplane bits): DeconBands independent bands of DeconBandBits sign
  // bits each; a pair is a candidate if ANY band matches (± one flipped
  // bit). At p = 1 − θ/π ≈ 0.58 per bit that is ~90% recall, and the
  // per-band bit width is the scale dial: candidate mass per eval vector is
  // Bands·(Bits+1)·n/2^Bits, so a 100 TB corpus raises Bits (more, smaller
  // buckets) while keeping Bands·recall fixed.
  // The benchmark set is FIXED as the corpus grows — every DeconEvery-th
  // vec_id within the first DeconEvalMax ids (an eval suite doesn't grow
  // with the crawl) — so candidate mass is strictly linear in corpus size:
  // |eval|·Bands·(Bits+1)·n/2^Bits. An unbounded `% DeconEvery` eval set
  // measured 10.9×/decade at sf1 (both sides growing ⇒ quadratic mass);
  // the cap restores the deployment shape and the linear plan.
  private val DeconEvery = 29
  private val DeconEvalMax = 2000
  private val DeconTau = 0.30
  private val DeconBands = 4
  private val DeconBandBits = 4
  // q140 semantic source matrix: pair threshold over the q139 hash
  // embeddings (unit vectors ⇒ cosine = dot). 0.9 = near-identical
  // content; at 0.5 the synthetic corpus lights up every source pair
  // (measured 70k pairs vs 47 — topical correlation, not provenance).
  // Codes are computed over MEAN-CENTERED vectors: correlated corpora
  // concentrate raw sign patterns (measured: one bucket held 26% of
  // sf0.1 — quadratic mass under growth); centering restores near-
  // uniform buckets (max 160/5000, candidate mass ÷8) at the cost of
  // unstable signs for docs near the mean — recovered by running
  // SemSrcBands=8 bands instead of q135's 4 (measured recall 0.81 at 4
  // centered bands, ≥0.9 at 8; spec floor 0.8).
  private val SemSrcTau = 0.9
  private val SemSrcBands = 8
  private val PqSubspaces = 4 // q107 product-quantization subspaces
  private val PqSubDim = 16   // dims per subspace (4 × 16 = 64)
  private val PqK = 4         // codebook size per subspace

  /** Corpus with the l2 norm precomputed once per vector — every downstream
    * pairwise stage is then a single dot product.
    */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProductExpression.register(s)
    graft.functions.IvfTopPicksExpression.register(s)
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("n", l2NormNative(col("v")))
  }

  /** One Lloyd assignment step: every vector to its nearest centroid by
    * squared L2 distance (computed as three dot products — no intermediate
    * difference array). The K centroids fold into ONE broadcast array row
    * and each vector takes an `array_min` argmin over it, so assignment is
    * strictly map-side — no window, no corpus shuffle, ever. Both norms are
    * precomputed once (‖v‖² per row, ‖c‖² per centroid) so the O(K·corpus)
    * stage does exactly one fresh dot product per (vector, centroid) pair.
    * Ties break by (rounded distance, c_id) via struct ordering, mirroring
    * the oracle's rank exactly.
    */
  private def lloydAssign(e: DataFrame, cent: DataFrame): DataFrame =
    assignCompiled(e, cent, 1)

  /** The assign kernel, compiled: centroids collect to the driver (K × dim
    * doubles — bounded by construction) and broadcast; each partition runs
    * a primitive loop computing the SAME arithmetic as the previous
    * higher-order-function form — left-to-right dot products (the
    * `vec_dot` contract), d2 = ‖v‖² − 2·v·c + ‖c‖², HALF_UP 6-dp rounding,
    * (rd2, c_id) tie order — so outputs are bit-identical and the DuckDB
    * oracles replay unchanged. Why mapPartitions here (the documented
    * last-resort tier): Catalyst evaluates HOF lambdas INTERPRETED, and
    * q113's corpus-scaled K makes the assign stage n·K = n²/ClusterSize
    * dot products — at 100× bench data the interpretation overhead
    * dominated the whole query (measured 34 s of a 44 s run). The kernel
    * stays strictly map-side: broadcast centroids, no shuffle, and the
    * n·K flop count itself is embarrassingly parallel across executors.
    */
  private def assignCompiled(e: DataFrame, cent: DataFrame, probes: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Double], Double)] = cent.collect().map { r =>
      val cv = r.getSeq[Double](r.fieldIndex("cv")).toArray
      var cc = 0.0
      var i = 0
      while (i < cv.length) { cc += cv(i) * cv(i); i += 1 }
      (r.getLong(r.fieldIndex("c_id")), cv, cc)
    }
    val bc = spark.sparkContext.broadcast(cents)
    e.select(col("vec_id"), col("v")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, vs) =>
          val v = vs.toArray
          var vv = 0.0
          var i = 0
          while (i < v.length) { vv += v(i) * v(i); i += 1 }
          val scored = new Array[(Double, Long, Double)](cs.length)
          var k = 0
          while (k < cs.length) {
            val (cid, cv, cc) = cs(k)
            var dp = 0.0
            var j = 0
            val n = math.min(v.length, cv.length)
            while (j < n) { dp += v(j) * cv(j); j += 1 }
            val d2 = vv - 2.0 * dp + cc
            val rd2 = java.math.BigDecimal.valueOf(d2)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            scored(k) = (rd2, cid, d2)
            k += 1
          }
          scored.sortBy(t => (t._1, t._2)).take(probes)
            .iterator.map(t => (id, vs, t._2, t._3))
        }
      }
      .toDF("vec_id", "v", "c_id", "d2")
  }

  /** Multi-probe assignment: every vector to its `probes` nearest centroids
    * (by the same rounded-distance/c_id ordering as [[lloydAssign]]) — the
    * IVF multi-probe analog for blocking, still strictly map-side: the
    * centroid array is one broadcast row, the top-`probes` pick is an
    * array_sort + slice per vector, and the explode multiplies rows by
    * `probes`, never shuffles.
    */
  private def probeAssign(e: DataFrame, cent: DataFrame, probes: Int): DataFrame =
    assignCompiled(e, cent, probes).select("vec_id", "v", "c_id")

  /** Centroid update: per-(cluster, dim) mean, re-assembled into an array.
    * Components round to 9 dp so partition-order summation noise cannot
    * flip the next assignment (same convention as q32's centroids).
    *
    * ONE object-hash aggregation since r17 (the measured centroid-update
    * lever — [[graft.functions.VecSumAggregator]]): the previous
    * `posexplode → groupBy(c_id, pos) → avg → re-assemble` multiplied the
    * corpus ×dim before its exchange (12.8M rows at sf10 for an 800×64
    * result); the typed vector-sum folds each partition into K primitive
    * arrays and shuffles only the K·partitions partials. Same mean, same
    * 9-dp rounding — summation order shifts, which the 9-dp round exists
    * to absorb (it is already partitioning-dependent either way).
    */
  private def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("c_id")
      // count(v), not count(*): the aggregator's add() skips null vectors,
      // so the divisor must count the same rows the sum saw — count(*)
      // would silently deflate a centroid whose cluster holds a null
      // embedding (r17 ADVICE; the old posexplode+avg form dropped nulls
      // from both sum and count, and this keeps that semantics explicit)
      .agg(count(col("v")).as("cnt"),
        graft.functions.VecSumAggregator.vecSum(col("v")).as("sv"))
      .select(col("c_id"),
        transform(col("sv"), x => round(x / col("cnt"), 9)).as("cv"))

  /** Within-cluster pair kernel shared by q113/q129: cosine over same-bucket
    * (a, b) pairs with a < b, thresholded at [[NearDupTau]]. A pair sharing
    * BOTH probed clusters surfaces twice — identical rows (cosine is
    * deterministic), so `distinct` is exact.
    *
    * COMPILED (the documented last-resort tier, same justification record
    * as [[assignCompiled]]): the self-join form materializes Σ cohort²/2
    * candidate UnsafeRows each carrying two 64-double arrays — measured
    * 36 s of a 40 s sf10 run (~4×10⁸ candidates), pure row-materialization
    * overhead around a codegen'd dot. Here each cluster's members load ONCE
    * into primitive arrays and a lazy iterator walks i<j pairs — the SAME
    * shuffle (one hash exchange on c_id), the SAME arithmetic in the same
    * order (left-to-right dot — multiplication is commutative so (a,b)
    * orientation cannot change the double; na·nb likewise; HALF_UP 4-dp
    * via the exact BigDecimal path Spark's `round` uses), so outputs are
    * bit-identical and the DuckDB oracles replay unchanged (driver gate +
    * the PipelineSpec subset/recall laws pin this). The cheap pre-filter
    * `cos > 0.3999` is lossless: any double ≤ 0.3999 rounds to ≤ 0.3999 <
    * NearDupTau, so only survivors pay the BigDecimal. Memory: one cohort
    * of primitive vectors per task (~cohort×dim doubles — cohorts are
    * bounded by the adaptive-K contract), never the candidate set.
    */
  private[graft] def neardupPairsExact(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    // strictly below every double that 4-dp-rounds to ≥ NearDupTau
    val preTau = NearDupTau - 1e-4
    // r19: per-pair int8 certified prune INSIDE the kernel (the q140 bound,
    // without r17's measured-slower staged join restructure): each cohort
    // member is int8-coded ONCE at load (q_i = round(v_i/sc), sc = max|v|/127,
    // u = sc/n, err = ‖v−sc·q‖/n — [[withInt8Codes]]'s arithmetic), and every
    // i<j pair first evaluates the certified upper bound
    // ua·ub·dotq + (1+ea)·eb + ea — an INTEGER dot (1-cycle add chain) vs the
    // serial-FMA double dot. Only pairs whose bound clears [[certBound]] pay
    // the exact left-to-right double dot, which is bit-identical to the
    // unfiltered kernel (same accumulation order, merely skipped when the
    // bound certifies the 4-dp gate cannot pass) — so survivors, and the
    // DuckDB oracles, are unchanged (Round19Spec pins ≡ the retained
    // [[neardupPairsExactRef]]). The prune fires only on a FINITE bound
    // strictly below certBound (`!(bnd < bound)` falls through on NaN), so
    // zero-norm/zero-vector members keep their exact-path behaviour.
    val bound = certBound(NearDupTau)
    assigned.select(col("c_id"), col("vec_id"), col("v"), col("n"))
      .as[(Long, Long, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ms = it.toArray
        val m = ms.length
        val ids = new Array[Long](m)
        val vs = new Array[Array[Double]](m)
        val ns = new Array[Double](m)
        val qs = new Array[Array[Byte]](m)
        val us = new Array[Double](m)
        val es = new Array[Double](m)
        var x = 0
        while (x < m) {
          val t = ms(x)
          ids(x) = t._2
          val v = t._3.toArray
          vs(x) = v
          ns(x) = t._4
          var ma = 0.0
          var d = 0
          while (d < v.length) {
            val a = math.abs(v(d)); if (a > ma) ma = a; d += 1
          }
          if (ma > 0.0 && ns(x) > 0.0) {
            val sc = ma / 127.0
            val q = new Array[Byte](v.length)
            var e2 = 0.0
            d = 0
            while (d < v.length) {
              val qi = Math.round(v(d) / sc).toInt
              q(d) = qi.toByte
              val r = v(d) - qi * sc
              e2 += r * r
              d += 1
            }
            qs(x) = q; us(x) = sc / ns(x); es(x) = math.sqrt(e2) / ns(x)
          } else {
            // degenerate member (zero vector / zero norm): NaN err keeps the
            // bound NaN so the prune never fires and the exact path decides
            qs(x) = new Array[Byte](v.length); us(x) = 0.0; es(x) = Double.NaN
          }
          x += 1
        }
        new Iterator[(Long, Long, Double)] {
          private var i = 0
          private var j = 1
          private var nextPair: (Long, Long, Double) = null
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && i < m - 1) {
              val idA = ids(i); val va = vs(i); val na = ns(i)
              val qa = qs(i); val ua = us(i); val ea = es(i)
              while (nextPair == null && j < m) {
                val qb = qs(j)
                var dotq = 0L
                var d = 0
                val qdim = math.min(qa.length, qb.length)
                while (d < qdim) { dotq += qa(d) * qb(d); d += 1 }
                val bnd = ua * us(j) * dotq + (1.0 + ea) * es(j) + ea
                if (!(bnd < bound)) {
                  val vb = vs(j)
                  var dp = 0.0
                  d = 0
                  val dim = math.min(va.length, vb.length)
                  while (d < dim) { dp += va(d) * vb(d); d += 1 }
                  val cos = dp / (na * ns(j))
                  if (cos > preTau) {
                    val rcos = java.math.BigDecimal.valueOf(cos)
                      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
                    if (rcos >= NearDupTau) {
                      val idB = ids(j)
                      nextPair =
                        if (idA < idB) (idA, idB, rcos) else (idB, idA, rcos)
                    }
                  }
                }
                j += 1
              }
              if (j >= m) { i += 1; j = i + 1 }
            }
          }
          advance()
          override def hasNext: Boolean = nextPair != null
          override def next(): (Long, Long, Double) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("a_id", "b_id", "cos_sim")
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** The r18 kernel (no int8 prune), retained as the Round19Spec equality
    * oracle for [[neardupPairsExact]] — never on a query path.
    */
  private[graft] def neardupPairsExactRef(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val preTau = NearDupTau - 1e-4
    assigned.select(col("c_id"), col("vec_id"), col("v"), col("n"))
      .as[(Long, Long, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ms = it.map(t => (t._2, t._3.toArray, t._4)).toArray
        new Iterator[(Long, Long, Double)] {
          private var i = 0
          private var j = 1
          private var nextPair: (Long, Long, Double) = null
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && i < ms.length - 1) {
              val (idA, va, na) = ms(i)
              while (nextPair == null && j < ms.length) {
                val (idB, vb, nb) = ms(j)
                var dp = 0.0
                var d = 0
                val dim = math.min(va.length, vb.length)
                while (d < dim) { dp += va(d) * vb(d); d += 1 }
                val cos = dp / (na * nb)
                if (cos > preTau) {
                  val rcos = java.math.BigDecimal.valueOf(cos)
                    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
                  if (rcos >= NearDupTau)
                    nextPair =
                      if (idA < idB) (idA, idB, rcos) else (idB, idA, rcos)
                }
                j += 1
              }
              if (j >= ms.length) { i += 1; j = i + 1 }
            }
          }
          advance()
          override def hasNext: Boolean = nextPair != null
          override def next(): (Long, Long, Double) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("a_id", "b_id", "cos_sim")
      .distinct()
      .orderBy("a_id", "b_id")
  }

  /** Certified-lossless prune threshold for a HALF_UP-4dp cosine gate at
    * `tau` (r16 ADVICE — derived from the tau, not a hardcoded twin): the
    * exact filter keeps a pair iff round(cos, 4) ≥ tau iff cos ≥ tau − 5e-5
    * (the round-half-up boundary), so a certified UPPER bound on cos may
    * drop the pair only when it cannot reach tau − 5e-5; the extra 2e-9
    * slack absorbs double rounding inside the bound arithmetic itself and
    * only ever ADMITS more candidates.
    */
  private[graft] def certBound(tau: Double): Double = tau - 5e-5 - 2e-9

  /** Symmetric-int8 quantization columns appended MAP-SIDE from (v, n):
    * q_i = round(v_i/sc) at sc = max|v|/127, u = sc/‖v‖, err = ‖v−sc·q‖/‖v‖
    * — the q140 coding, factored for the ANN tier (r16 verdict item 1).
    * Same arithmetic as [[semSrcInput]]'s columns; callers must ensure
    * n > 0 (zero-norm vectors have no cosine and are excluded by every
    * consumer's exact gate anyway).
    */
  private def withInt8Codes(df: DataFrame): DataFrame =
    df.withColumn("ma", array_max(transform(col("v"), x => abs(x))))
      .withColumn("sc", col("ma") / lit(127.0))
      .withColumn("q", when(col("ma") > 0,
          transform(col("v"), x => round(x / col("sc")).cast("byte")))
        .otherwise(transform(col("v"), _ => lit(0).cast("byte"))))
      .withColumn("er", when(col("ma") > 0, sqrt(aggregate(
          zip_with(col("v"), col("q"),
            (x, qq) => pow(x - qq.cast("double") * col("sc"), lit(2))),
          lit(0.0), (acc, z) => acc + z))).otherwise(col("n")))
      .withColumn("u", col("sc") / col("n"))
      .withColumn("err", col("er") / col("n"))
      .drop("ma", "sc", "er")

  /** TWO-STAGE pair candidates (q140's certified int8 prune applied to
    * the ANN tier): the cluster-key exchange carries only (c_id, vec_id,
    * q·64 int8, u, err) ≈ 90 bytes — NOT the 64-double vector — and the
    * compiled i<j kernel evaluates the certified upper bound
    * ua·ub·vec_dot_i8(qa,qb) + (1+ea)·eb + ea ≥ certBound(tau) per pair
    * (the bound is exactly q140's, divided through by na·nb > 0, valid
    * for ANY norms). A pair is emitted only when the bound says the exact
    * gate COULD pass — provably lossless, so oracles replay unchanged.
    *
    * LIBRARY form, not q129/q130's production tail (r17 measured
    * reversal): the design wins iff survivors ≪ candidate mass (q140:
    * 42 of 1.3M at tau 0.9). At q129's tau 0.4 the sf10 corpus yields
    * 12.9M TRUE pairs from 22.8M certified candidates — the late
    * materialization then joins/shuffles more bytes than the compact
    * codes save (measured 16.2 s staged vs 12.5 s exact). Deployments
    * near-dup-ing at high tau (the common LLM-curation setting) should
    * use this form; Round17Spec pins bit-identical results either way.
    */
  private[graft] def neardupCandidates(assigned: DataFrame): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val bound = certBound(NearDupTau)
    withInt8Codes(assigned.filter(col("n") > 0))
      .select(col("c_id"), col("vec_id"), col("q"), col("u"), col("err"))
      // Seq[Byte], not Array[Byte]: the tuple encoder maps Array[Byte] to
      // BinaryType, but the column is array<tinyint>; toArray below
      // unboxes once per ROW, never per pair
      .as[(Long, Long, Seq[Byte], Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val ms = it.map(t => (t._2, t._3.toArray, t._4, t._5)).toArray
        new Iterator[(Long, Long)] {
          private var i = 0
          private var j = 1
          private var nextPair: (Long, Long) = null
          private def advance(): Unit = {
            nextPair = null
            while (nextPair == null && i < ms.length - 1) {
              val (idA, qa, ua, ea) = ms(i)
              while (nextPair == null && j < ms.length) {
                val (idB, qb, ub, eb) = ms(j)
                var dotq = 0L
                var d = 0
                val dim = math.min(qa.length, qb.length)
                while (d < dim) { dotq += qa(d).toLong * qb(d); d += 1 }
                if (ua * ub * dotq + (1.0 + ea) * eb + ea >= bound)
                  nextPair =
                    if (idA < idB) (idA, idB) else (idB, idA)
                j += 1
              }
              if (j >= ms.length) { i += 1; j = i + 1 }
            }
          }
          advance()
          override def hasNext: Boolean = nextPair != null
          override def next(): (Long, Long) = {
            val r = nextPair; advance(); r
          }
        }
      }
      .toDF("a_id", "b_id")
  }

  /** Two-stage near-dup pairs: certified-bound candidates from the compact
    * code kernel, then LATE MATERIALIZATION — the full vectors (and norms)
    * join back by id for the survivors only, and the exact HALF_UP-4dp
    * cosine gate replays verbatim (dotNative sums left-to-right like the
    * compiled kernel; Spark `round` is the same BigDecimal HALF_UP — so
    * results are bit-identical to [[neardupPairs]] and the DuckDB oracles
    * are UNCHANGED; Round17Spec pins result equality and the plan shape).
    * `vecs` is the one-row-per-vector (vec_id, v, n) corpus.
    */
  private[graft] def neardupPairsStaged(assigned: DataFrame,
    vecs: DataFrame): DataFrame =
    neardupCandidates(assigned)
      .distinct()
      .join(vecs.select(col("vec_id").as("a_id"), col("v").as("va"),
        col("n").as("na")), "a_id")
      .join(vecs.select(col("vec_id").as("b_id"), col("v").as("vb"),
        col("n").as("nb")), "b_id")
      .withColumn("cos",
        dotNative(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(round(col("cos"), 4) >= NearDupTau)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("a_id", "b_id")

  // ---- staged-tail SELF-SELECTION (r17 verdict item 2). The r17 probe
  // turned the staged-vs-exact choice into arithmetic — staged wins iff
  // the certified survivors are a small fraction of the kernel's candidate
  // mass (q140's regime: 42 of 1.3M at tau 0.9 → int8 codes shrink the
  // exchange and the late-materialization joins are free), and loses when
  // survivors ≈ output (q129's sf10 corpus at tau 0.4: 22.8M certified of
  // 257M candidates, S/C ≈ 0.089, measured 16.2 s staged vs 12.5 s exact
  // — the survivor joins shuffle more bytes than the compact codes save).
  // [[annTailAudit]] measures and PERSISTS the two counters for a corpus;
  // [[useAnnTailAudit]] registers the evidence for a session — the
  // learned-hot-key/useAuditDial load-at-start pattern (reference
  // SuperNodeCollector.scala:13-65) applied to the ANN tier — and every
  // [[neardupPairs]] consumer (q113/q129/servedPairs) then self-selects.
  // The driver/oracle gate never registers an audit, so every oracle-bound
  // row replays the exact kernel unchanged; both branches are spec-pinned
  // bit-identical anyway (Round17/18Spec), so the dial is a pure
  // performance choice, never a semantics one. ----

  /** Staged wins only when survivors ≪ candidates; the measured bracket is
    * [3e-5 → staged clearly wins] vs [0.089 → exact wins by 1.3×], and the
    * join cost grows linearly in S, so the cutover sits conservatively at
    * 1% — past it the exact kernel's simplicity is the better bet.
    */
  private[graft] val AnnTailSurvivorFrac = 0.01

  private val annTailDial =
    scala.collection.concurrent.TrieMap[SparkSession, Boolean]()
  Memos.register(s => { annTailDial.remove(s); () })

  /** Measure and persist the pair-tail evidence for `assigned`'s corpus:
    * candidate mass C = Σ cohort·(cohort−1)/2 (what ANY kernel walks) and
    * survivor mass S = the certified-bound pass's emitted rows (what the
    * staged form must join/materialize; counted with cross-cluster
    * multiplicity — the honest stage-1 output mass, an upper bound on the
    * post-distinct join input). One run= generation per call, ascending
    * ids, overwrite-idempotent. Returns (C, S).
    */
  def annTailAudit(s: SparkSession, assigned: DataFrame,
    auditDir: String): (Long, Long) = {
    val a = assigned.persist()
    try {
      val c = a.groupBy("c_id").agg(count(lit(1)).as("sz"))
        .agg(coalesce(sum(expr("sz * (sz - 1) DIV 2")), lit(0L)))
        .collect()(0).getLong(0)
      val sv = neardupCandidates(a).count()
      val nextId = auditRuns(s, auditDir)
        .map(_.agg(max("run_id")).collect()(0).getLong(0) + 1L)
        .getOrElse(0L)
      import s.implicits._
      Seq((nextId, c, sv, NearDupTau))
        .toDF("run_id", "candidate_mass", "survivor_mass", "tau")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$auditDir/run=$nextId")
      (c, sv)
    } finally { a.unpersist(); () }
  }

  private def auditRuns(s: SparkSession, auditDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(auditDir)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else try Some(s.read.parquet(s"$auditDir/run=*"))
    catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Register `auditDir` as this session's pair-tail evidence (read ONCE,
    * at registration — re-register to re-read): the LATEST persisted run's
    * S/C ratio picks the staged form iff S ≤ [[AnnTailSurvivorFrac]]·C.
    * Returns whether the staged tail was chosen (false: exact kernel —
    * also the no-evidence fallback).
    */
  def useAnnTailAudit(s: SparkSession, auditDir: String): Boolean = {
    Memos.hook(s)
    val staged = stagedFromAudit(s, auditDir)
    annTailDial(s) = staged
    staged
  }

  /** Unregister (spec hook; a fresh session is also unregistered). */
  def clearAnnTailAudit(s: SparkSession): Unit = { annTailDial.remove(s); () }

  private[graft] def annTailStagedChosen(s: SparkSession): Boolean =
    annTailDial.getOrElse(s, false)

  /** The decision arithmetic on the latest persisted run (no runs → false:
    * with no evidence the exact kernel is the safe default — it was the
    * measured winner on the only corpus large enough to hurt).
    */
  private[graft] def stagedFromAudit(s: SparkSession, auditDir: String): Boolean =
    auditRuns(s, auditDir).exists { runs =>
      val r = runs.orderBy(col("run_id").desc).limit(1)
        .select("candidate_mass", "survivor_mass").collect()
      r.nonEmpty && r(0).getLong(0) > 0L &&
        r(0).getLong(1).toDouble <= AnnTailSurvivorFrac * r(0).getLong(0)
    }

  /** The pair tail every consumer calls — the exact compiled kernel by
    * default, the two-stage int8 form when this session's registered
    * audit evidence says survivors ≪ candidates (see the dial block
    * above). Both branches are bit-identical by construction and by spec
    * pin, so oracles never see the difference.
    */
  private[graft] def neardupPairs(assigned: DataFrame): DataFrame = {
    val s = assigned.sparkSession
    if (annTailDial.getOrElse(s, false))
      neardupPairsStaged(assigned,
        assigned.select("vec_id", "v", "n").dropDuplicates("vec_id"))
    else neardupPairsExact(assigned)
  }

  // ---- q129 two-level IVF stages, factored (r09 VERDICT #2/#4): the
  // PlanSpec pin inspects the UNCUT candidate pipeline via the pluggable
  // `cut`, and the persistent ANN index (AnnIndex) trains ONCE through
  // ivf2TrainCoarse/ivf2TrainFine and serves many queries through
  // ivf2VecProbes + ivf2FinalAssign against the stored centroid tables. ----

  private[graft] def ivf2Corpus(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).select("vec_id", "v")

  /** Adaptive cluster counts: fine K keeps expected cluster size constant,
    * coarse G = ⌈√K⌉ groups keep every stage at n·√K flops.
    */
  private[graft] def ivf2KG(e: DataFrame): (Long, Long) = {
    val k = math.max(KMeansK.toLong, e.count() / NearDupClusterSize)
    (k, math.ceil(math.sqrt(k.toDouble)).toLong)
  }

  /** COARSE quantizer (q113 trains fine centroids with a FULL n·K Lloyd
    * pass — the very stage q129 exists to remove, so even training is
    * group-restricted): first-G seed, one Lloyd step over the corpus —
    * n·G flops, compiled. The ONLY compiled-kernel collects on the q129
    * path are this table's G = √K rows.
    */
  private[graft] def ivf2TrainCoarse(e: DataFrame, g: Long,
    cut: DataFrame => DataFrame): DataFrame = {
    val coarse0 = e.filter(col("vec_id") < g)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    cut(centroidsOf(lloydAssign(e, coarse0)))
  }

  /** Every vector's CoarseProbes nearest groups — n·G flops. Cut: it feeds
    * both restricted assigns, and its lineage holds a corpus pass.
    */
  private[graft] def ivf2VecProbes(e: DataFrame, coarse: DataFrame,
    cut: DataFrame => DataFrame): DataFrame =
    cut(assignCompiled(e, coarse, CoarseProbes)
      .select(col("vec_id"), col("v"), col("c_id").as("g_id"))
      .withColumn("vv", dotNative(col("v"), col("v"))))

  /** Centroid-side table for the restricted assigns: each centroid →
    * its coarse group, folded to ONE array row per group. The K rows stay
    * DISTRIBUTED — grouped and equi-joined on g_id (Spark auto-broadcasts
    * while the group table is small and falls back to a shuffle join
    * beyond the threshold — the size-adaptive behavior a 100 TB corpus
    * needs).
    */
  private def ivf2Grouped(cents: DataFrame, coarse: DataFrame): DataFrame =
    assignCompiled(cents, coarse, 1)
      .select(col("c_id").as("g_id"), col("vec_id").as("c_id"), col("v").as("cv"))
      .withColumn("cc", dotNative(col("cv"), col("cv")))
      .groupBy("g_id")
      .agg(collect_list(struct(col("c_id"), col("cv"), col("cc"))).as("cents"))

  /** Group-RESTRICTED argmin: each vector against only the centroids in
    * its probed groups (n·CoarseProbes·K/G ≈ n·√K dot products), ranked
    * by the same (HALF_UP-6dp d2, c_id) order as assignCompiled.
    *
    * NATIVE since r17: the per-group rank runs as ONE compiled expression
    * (`ivf_top_picks` — [[graft.functions.IvfTopPicksExpression]]) instead
    * of an interpreted `transform`+`array_sort` lambda per centroid —
    * measured as ~70% of q129's sf10 wall across the two passes. The
    * arithmetic, rounding, and tie order are bit-identical (pinned by
    * Round17Spec against the HOF form), so the oracle replays unchanged;
    * the join/plan shape is untouched.
    */
  private def ivf2TopPicks(vecProbes: DataFrame, cents: DataFrame,
    nPicks: Int): DataFrame =
    vecProbes.join(cents, "g_id")
      .select(col("vec_id"), col("v"),
        call_function("ivf_top_picks", col("v"), col("vv"), col("cents"),
          lit(nPicks)).as("picks"))
      // global top across probed groups = top of the per-group tops
      // (each group's candidates are disjoint); v rides along via
      // first() — identical across a vector's probe rows
      .groupBy("vec_id")
      .agg(slice(array_sort(flatten(collect_list(col("picks")))),
        1, nPicks).as("picks"), first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), explode(col("picks")).as("p"))
      .select(col("vec_id"), col("v"), col("p.c_id").as("c_id"))

  /** One RESTRICTED fine Lloyd step over the first-K seeds → the trained
    * fine centroid table (c_id, cv).
    */
  private[graft] def ivf2TrainFine(e: DataFrame, k: Long, coarse: DataFrame,
    vecProbes: DataFrame, cut: DataFrame => DataFrame): DataFrame = {
    val seeds = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("vec_id"), col("v"))
    cut(centroidsOf(ivf2TopPicks(vecProbes, ivf2Grouped(seeds, coarse), 1)))
  }

  /** Final restricted assign against the TRAINED fine centroids — the
    * (vec_id, v, n, c_id) layout the shared q113 pair kernel consumes.
    */
  private[graft] def ivf2FinalAssign(vecProbes: DataFrame, coarse: DataFrame,
    fine: DataFrame, cut: DataFrame => DataFrame): DataFrame =
    cut(ivf2TopPicks(vecProbes,
      ivf2Grouped(fine.select(col("c_id").as("vec_id"), col("cv").as("v")), coarse),
      NearDupProbes)
      .withColumn("n", l2NormNative(col("v")))
      .select("vec_id", "v", "n", "c_id"))

  /** The full q129 assignment pipeline (train + assign in one lineage —
    * the ad-hoc form; AnnIndex is the train-once/serve-many form).
    */
  private[graft] def ivf2Assigned(s: SparkSession, dir: String,
    cut: DataFrame => DataFrame = graft.Lineage.cut(_)): DataFrame = {
    val e = ivf2Corpus(s, dir)
    val (k, g) = ivf2KG(e)
    val coarse1 = ivf2TrainCoarse(e, g, cut)
    val vecProbes = ivf2VecProbes(e, coarse1, cut)
    val fine = ivf2TrainFine(e, k, coarse1, vecProbes, cut)
    ivf2FinalAssign(vecProbes, coarse1, fine, cut)
  }

  /** Within-cluster pairs from a stored/served assignment — q129's pair
    * tail exposed for AnnIndex (the exact kernel; see the q129 entry for
    * the measured staged-form reversal).
    */
  private[graft] def ivf2Pairs(assigned: DataFrame): DataFrame =
    neardupPairs(assigned)

  /** The (vec_id, v, n) corpus side [[neardupPairsStaged]] joins back to. */
  private[graft] def ivf2Vecs(s: SparkSession, dir: String): DataFrame =
    corpus(s, dir).select("vec_id", "v", "n")

  /** Rank candidate (q_id, nbr_id, cos) triples and keep the top-k per query.
    * Ranking uses cosine rounded to 6 dp with nbr_id tie-break so the order
    * is reproducible across engines.
    */
  private def topK(cand: DataFrame): DataFrame = {
    val w = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 6).desc, col("nbr_id").asc)
    cand
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("q_id"), col("rnk"), col("nbr_id"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact ANN baseline: broadcast the queries, scan the corpus once.
    "q31_cosine_topk" -> ((s, dir) => {
      // explicit 3-column projection on BOTH sides of the one intentional
      // BNLJ (the brute-force oracle form for q32/q50): the streamed corpus
      // scan and the broadcast build must never carry label or any other
      // unused column through the nested loop
      val e = corpus(s, dir).select("vec_id", "v", "n")
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n").as("qn"))
      val cand = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("n"))).as("cos"))
      topK(cand)
    }),

    // IVF-bucketed ANN: centroids = per-label mean vectors (deterministic
    // k-means stand-in), every vector assigned to its nearest centroid,
    // queries probe their NProbe nearest buckets (multi-probe compensates
    // for weak clustering). Oracle-checked: the whole pipeline is
    // deterministic arithmetic, so DuckDB re-derives centroids, assignment,
    // probing, and top-k. Centroid components round to 9 dp on both sides —
    // mean-summation order is engine/partition dependent and last-ulp
    // differences must not flip a bucket assignment.
    "q32_ivf_topk" -> ((s, dir) => {
      val e = corpus(s, dir)
      // (a) centroids: per-label mean vectors (shared centroidsOf pipeline —
      // one rounding convention to keep in sync with the oracle, not two).
      val cent = centroidsOf(e.select(col("label").as("c_id"), col("v")))
      // (b) centroid affinity: broadcast nested loop + rank per vector.
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(round(col("c_cos"), 6).desc, col("c_id").asc)
      val ranked = e.join(broadcast(cent))
        .withColumn("c_cos", dotNative(col("v"), col("cv")) / (col("n") * l2NormNative(col("cv"))))
        .withColumn("rn", row_number().over(wAssign))
      // corpus vectors live in exactly one bucket (rn=1)...
      val assigned = ranked.filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("n"), col("c_id").as("bucket"))
      // ...while queries probe their NProbe nearest buckets.
      val q = ranked.filter(col("vec_id") < NumQueries && col("rn") <= NProbe)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n").as("qn"),
          col("c_id").as("bucket"))
      // (c) probe: equi-join on the bucket key only — scans NProbe/K of the corpus.
      val cand = assigned.join(broadcast(q), Seq("bucket"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("n"))).as("cos"))
      topK(cand)
    }),

    // IVF centroid TRAINING (not the per-label stand-in q32 uses):
    // Lloyd's k-means with deterministic init (the first K vectors by
    // vec_id), one centroid update between two assignment phases. Each
    // assignment is a broadcast nested loop (K rows against corpus
    // splits); each update shuffles only K·dim partial means. The loop
    // unrolls to a fixed depth here so the oracle can replay it as
    // nested CTEs; production training iterates lloydAssign/centroidsOf
    // to convergence with the same per-step plans.
    "q73_kmeans_train" -> ((s, dir) => {
      val e = corpus(s, dir).drop("n")
      val cent0 = e.filter(col("vec_id") < KMeansK)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val cent1 = centroidsOf(lloydAssign(e, cent0))
      lloydAssign(e, cent1)
        .groupBy("c_id")
        .agg(count(lit(1)).as("n_members"),
          round(avg("d2"), 6).as("avg_d2"))
        .orderBy("c_id")
    }),

    // CLUSTER-CORESET selection (diversity-preserving subsample — the
    // "prune duplicates, keep coverage" curation step after SemDeDup):
    // keep the ⌈CoresetPct%⌉ most-CENTRAL members of every learned
    // cluster, so the kept set spans every region of embedding space
    // while each region sheds its redundant tail. Centrality = squared
    // L2 to the trained centroid (q73's two-pass Lloyd, same arithmetic
    // and tie order). The rank window partitions BY CLUSTER — per-cluster
    // extents are bounded by the adaptive-K contract (K grows with the
    // corpus), so no window ever sees more than a cluster's members; the
    // assign stage is the same broadcast map-side kernel as q73.
    "q146_cluster_coreset" -> ((s, dir) => {
      val e = corpus(s, dir).drop("n", "label")
      val cent0 = e.filter(col("vec_id") < KMeansK)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val cent1 = centroidsOf(lloydAssign(e, cent0))
      val w = Window.partitionBy("c_id")
        .orderBy(round(col("d2"), 6), col("vec_id"))
      lloydAssign(e, cent1)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("csize", count(lit(1)).over(Window.partitionBy("c_id")))
        .select(col("vec_id"), col("c_id"), col("rnk"),
          // ceil(csize·pct) kept per cluster: every cluster keeps at least
          // its medoid — a coreset that empties a region isn't a coreset
          ((col("rnk") - 1) * 100 < col("csize") * CoresetPct).as("kept"),
          round(col("d2"), 6).as("d2"))
        .orderBy("vec_id")
    }),

    // SemDeDup (Abbas et al.): semantic deduplication with LEARNED blocking —
    // k-means clusters (q73's trained centroids, not a given label) bound the
    // pairwise cosine kernel to within-cluster pairs, O(n²/K) instead of
    // O(n²), and at 100 TB the per-cluster work is an independent keyed
    // equi-join. Keep-rule: the lowest vec_id in each near-dup relation
    // survives; every other member reports dup_of = its smallest duplicate
    // neighbor.
    "q97_semdedup" -> ((s, dir) => {
      val e = corpus(s, dir).select("vec_id", "v")
      val cent0 = e.filter(col("vec_id") < KMeansK)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val cent1 = centroidsOf(lloydAssign(e, cent0))
      // the assignment table is referenced three times below (both sides of
      // the pair join + the final join-back): checkpoint it once so the two
      // Lloyd's passes run once, not 3× — the same O(1)-lineage discipline
      // as GraphEdges.pageRank / Clustering.minLabelComponents
      val assigned = lloydAssign(e, cent1)
        .withColumn("n", l2NormNative(col("v")))
        .select("vec_id", "v", "n", "c_id")
        .cutLineage()
      val dups = assigned.as("a")
        .join(assigned.as("b"),
          col("a.c_id") === col("b.c_id") && col("a.vec_id") > col("b.vec_id"))
        .withColumn("cos",
          dotNative(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")))
        .filter(round(col("cos"), 4) >= SemDedupTau)
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(min(col("b.vec_id")).as("dup_of"))
      assigned.select("vec_id", "c_id")
        .join(dups, Seq("vec_id"), "left")
        .select("vec_id", "c_id", "dup_of")
        .orderBy("vec_id")
    }),

    // Embedding near-dup with LEARNED blocking — the production form of
    // q30 (VERDICT r04 finding #4): q30 blocks on the fixed `label` column,
    // which is only the IVF-bucket analog while labels stay numerous and
    // balanced — one hot label at web scale makes the within-block kernel
    // quadratic. Here the blocking key is a trained k-means cluster, so
    // block sizes track the data distribution (skew splits across
    // centroids) and K scales with the corpus — K = max(KMeansK,
    // n/NearDupClusterSize), keeping expected cluster size constant and the
    // pairwise kernel linear in n. Each vector probes its
    // NearDupProbes nearest clusters (multi-probe IVF) so pairs straddling
    // a centroid boundary are still candidates — candidate volume grows
    // only ~probes× while recall roughly doubles vs single-probe (pinned by
    // PipelineSpec's recall law against the exact all-pairs set). Same pair
    // semantics and threshold as q30.
    // BOUNDED to a fixed id stripe (r12 verdict item 5): q113 is the
    // exact-recall COMPANION — its corpus-scaled K makes the assign/pair
    // stages n²/ClusterSize, the one remaining by-design quadratic in the
    // timed surface. The stripe pins which side grows (the q135 eval-set
    // rule): at and below bench scale it covers the whole corpus (the
    // recall laws are unchanged), beyond it the diagnostic runs on the
    // same fixed stripe forever while the production twins (q129/q130)
    // ride the full corpus at n·√K.
    "q113_clustered_neardup" -> ((s, dir) => {
      val e = corpus(s, dir).select("vec_id", "v")
        .filter(col("vec_id") < NearDupStripeMax)
      // adaptive K (one footer-cheap count; the corpus scan it triggers is
      // a single column-pruned pass, negligible next to the kernel it sizes)
      val k = math.max(KMeansK.toLong, e.count() / NearDupClusterSize)
      val cent0 = e.filter(col("vec_id") < k)
        .select(col("vec_id").as("c_id"), col("v").as("cv"))
      val cent1 = centroidsOf(lloydAssign(e, cent0))
      val assigned = probeAssign(e, cent1, NearDupProbes)
        .withColumn("n", l2NormNative(col("v")))
        .select("vec_id", "v", "n", "c_id")
        .cutLineage()
      neardupPairs(assigned)
    }),

    // TWO-LEVEL IVF near-dup — the scale form of q113 (VERDICT r08 #1):
    // every corpus-scaled stage in q113 is n·K dot products with K = n/250
    // (n²/250 flops — 12.1×/decade at sf10: the fine Lloyd TRAINING pass
    // and the final assign), and its centroid broadcast collects all K
    // centroids to the driver. Here a COARSE quantizer of G = ceil(√K)
    // groups trains first (first-G seed, one Lloyd step — n·G flops), and
    // BOTH fine stages are then group-restricted: the fine Lloyd step
    // ranks each vector against only the seeds of its CoarseProbes probed
    // groups, and the final assign does the same against the trained fine
    // centroids — n·(2G + 2·CoarseProbes·K/G) ≈ n·√K flops end to end; no
    // stage touches n·K. Only the G = √K coarse centroids are ever
    // collected; seeds and fine centroids stay DISTRIBUTED, folded
    // per-group and equi-joined on the group id (Spark auto-broadcasts
    // while that table is under the broadcast threshold and falls back to
    // a shuffle join beyond it — the size-adaptive behavior a 100 TB
    // corpus needs). Same fine probe width, threshold, and pair semantics
    // as q113; PipelineSpec pins recall ≥ 0.95 against q113 on a corpus
    // where the coarse stage genuinely restricts.
    // Pair tail: the EXACT compiled kernel, not the int8 two-stage form —
    // a measured reversal of the r16 verdict's item-1 hypothesis (r17
    // probe, sf10): the int8 gate bites 91% (257M in-cluster pairs →
    // 22.8M certified candidates), but the FINAL output is 12.9M pairs,
    // so survivors ≈ 1.8× output mass and the late-materialization joins
    // shuffle more bytes than the code rows save — staged measured 16.2 s
    // vs 12.5 s exact on the same host. q140's win criterion (survivors ≪
    // candidates; 42 rows from 1.3M candidates at tau 0.9) does not hold
    // at tau 0.4. The staged form stays as [[neardupPairsStaged]]
    // (Round17Spec pins its result equality) for corpora whose tau/density
    // DO satisfy the criterion — and since r18 the choice is SELF-SERVING:
    // [[neardupPairs]] consults the session's registered tail-audit
    // evidence ([[useAnnTailAudit]]) and takes the staged branch when the
    // persisted survivor/candidate ratio clears the cutover (the oracle
    // gate never registers one, so this entry always replays the exact
    // kernel). The measured lever here was the assignment pipeline
    // instead — see [[ivfTopPicksNative]].
    "q129_ivf2_neardup" -> ((s, dir) => neardupPairs(ivf2Assigned(s, dir))),

    // PERSISTENT-index serve (r09 VERDICT #4): identical pair semantics to
    // q129, but the coarse/fine centroids come from the mounted AnnIndex
    // catalog snapshots — training runs at MOST once per corpus fingerprint
    // (the first call mounts, every later call and every later APPLICATION
    // with matching snapshots is probe + restricted assign + pair kernel
    // only). The stored centroids are exactly what q129's training derives,
    // so this shares q129's oracle verbatim.
    "q130_ann_serve" -> ((s, dir) => AnnIndex.servedPairs(s, dir)),

    // Hard-negative mining (the contrastive-training data op — DPR/SBERT
    // style): for every query vector, the top-k most-similar vectors with a
    // DIFFERENT label — maximally confusing negatives. Same broadcast-query
    // single-corpus-scan shape as q31; the label inequality rides the join
    // condition so mismatched pairs never materialize.
    "q109_hard_negatives" -> ((s, dir) => {
      val e = corpus(s, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("v").as("qv"), col("n").as("qn"))
      val cand = e.join(broadcast(q), col("label") =!= col("q_label"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("n"))).as("cos"))
      topK(cand)
    }),

    // Prototypicality / outlier screening (the SemDeDup-sibling curation
    // rule: SemDeDup drops what sits TOO CLOSE to a neighbor, this flags
    // what sits too FAR from its own class): cosine of every vector to its
    // label's centroid, lowest-OutlierK per label flagged. The centroid
    // table is labels × dim — broadcast; scoring is map-side arithmetic on
    // the corpus splits; the only shuffle is the label-partitioned rank
    // window, so the shape survives any corpus size with bounded labels.
    "q104_embedding_outliers" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = corpus(s, dir)
      val cent = centroidsOf(e.select(col("label").as("c_id"), col("v")))
        .withColumn("cn", l2NormNative(col("cv")))
      val w = Window.partitionBy("label")
        .orderBy(round(col("cos"), 6).asc, col("vec_id").asc)
      e.join(broadcast(cent), col("label") === col("c_id"))
        .withColumn("cos", dotNative(col("v"), col("cv")) / (col("n") * col("cn")))
        .withColumn("rnk", row_number().over(w))
        .select(col("vec_id"), col("label"),
          round(col("cos"), 4).as("cos_centroid"), col("rnk"),
          (col("rnk") <= OutlierK).cast("int").as("outlier"))
        .orderBy("label", "rnk")
    }),

    // Product-quantization encoding (the PQ compression an ANN index at
    // 100 TB actually serves from — Jégou et al.): the 64-dim vector splits
    // into PqSubspaces 16-dim subvectors, each assigned to its nearest
    // per-subspace codebook centroid (deterministic init: the first PqK
    // vectors' subvectors), emitting PqSubspaces small codes + the total
    // quantization distortion. Every codebook folds to ONE broadcast row
    // and each assignment is an in-row argmin, so encoding is strictly
    // map-side — the corpus is scanned once and never shuffled or joined
    // against itself.
    "q107_pq_codes" -> ((s, dir) => {
      val e = corpus(s, dir).select("vec_id", "v")
      def sub(sp: Int): Column = slice(col("v"), sp * PqSubDim + 1, PqSubDim)
      val encoded = (0 until PqSubspaces).foldLeft(e) { (df, sp) =>
        val cent = e.filter(col("vec_id") < PqK)
          .select(col("vec_id").as("c_id"), sub(sp).as("cv"))
          .withColumn("cc", dotNative(col("cv"), col("cv")))
          .agg(collect_list(struct(col("c_id"), col("cv"), col("cc"))).as(s"cs$sp"))
        df.crossJoin(broadcast(cent))
          .withColumn(s"sv$sp", sub(sp))
          .withColumn(s"d2s$sp", transform(col(s"cs$sp"), c => struct(
            (dotNative(col(s"sv$sp"), col(s"sv$sp"))
              - lit(2.0) * dotNative(col(s"sv$sp"), c.getField("cv"))
              + c.getField("cc")).as("d2"),
            c.getField("c_id").as("c_id"))))
          .withColumn(s"best$sp", array_min(transform(col(s"d2s$sp"), x =>
            struct(round(x.getField("d2"), 6).as("rd2"),
              x.getField("c_id").as("c_id")))))
          .withColumn(s"code$sp", col(s"best$sp").getField("c_id"))
          .withColumn(s"d2_$sp", col(s"best$sp").getField("rd2"))
          .drop(s"cs$sp", s"sv$sp", s"d2s$sp", s"best$sp")
      }
      encoded.select(col("vec_id") +:
        (0 until PqSubspaces).map(sp => col(s"code$sp")) :+
        round((0 until PqSubspaces).map(sp => col(s"d2_$sp")).reduce(_ + _), 6)
          .as("distortion"): _*)
        .orderBy("vec_id")
    }),

    // Symmetric int8 quantization of the embedding column (the storage /
    // bandwidth stage an ANN index at 100 TB actually serves from):
    // per-vector scale = 127 / max|x|, reconstruction RMSE aggregated per
    // label. Entirely map-side higher-order-function arithmetic — the only
    // shuffle is the 3-row final aggregate.
    "q72_embedding_quantize" -> ((s, dir) => {
      val v = asDouble(col("embedding"))
      Tables.load(s, dir, "embeddings")
        .select(col("label"),
          array_max(transform(v, x => abs(x))).as("maxabs"), v.as("v"))
        .filter(col("maxabs") > 0)
        .withColumn("sc", lit(127.0) / col("maxabs"))
        .withColumn("rmse",
          sqrt(aggregate(
            transform(col("v"), x =>
              pow(x - round(x * col("sc")) / col("sc"), lit(2))),
            lit(0.0), (acc, e) => acc + e) / size(col("v"))))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("rmse"), 6).as("avg_rmse"),
          round(avg("maxabs"), 6).as("avg_maxabs"))
        .orderBy("label")
    }),

    // Hyperplane (signed-random-projection) LSH ANN: bucket = sign bits of
    // NumPlanes pseudo-random hyperplane dot products (planes derived from
    // md5 of (plane, dim) — deterministic, no shared RNG state needed on a
    // cluster, and exactly reproducible by the DuckDB oracle). Queries
    // multi-probe their own bucket plus all 1-bit flips. Candidate
    // generation is an equi-join on the bucket code → scans
    // ~(NumPlanes+1)/2^NumPlanes of the corpus. PipelineSpec additionally
    // measures recall vs the exact q31.
    "q50_hyperplane_lsh_topk" -> ((s, dir) => {
      val codedE = lshCoded(s, corpus(s, dir))
      // queries probe their code and every 1-bit flip of it
      val q = codedE.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n").as("qn"), col("code"))
        .withColumn("probe", explode(lshProbes(col("code"))))
        .drop("code")
      val cand = codedE.join(broadcast(q), col("code") === col("probe"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nbr_id"),
          (dotNative(col("qv"), col("v")) / (col("qn") * col("n"))).as("cos"))
        .distinct()
      topK(cand)
    }),

    // Semantic decontamination (embedding-space eval-set leakage): the
    // held-out benchmark vectors (every DeconEvery-th vec_id) are what a
    // training corpus must not contain near-copies of; any corpus vector
    // within DeconTau cosine of ANY benchmark vector is flagged with its
    // closest benchmark match. The n-gram twins (q67/q99) catch verbatim
    // leakage; this catches paraphrases the lexical forms miss. Scale
    // shape: the benchmark set is small by definition → broadcast after
    // band × multi-probe expansion; candidate generation is an equi-join
    // on (band, code) — md5-derived planes, deterministic on a cluster,
    // replayed exactly by the oracle; the best-match window partitions on
    // vec_id, so no stage ever shuffles more than the candidate mass
    // (Bands·(Bits+1)·|eval|·n/2^Bits pairs). PipelineSpec pins recall
    // ≥ 0.7 against the brute-force threshold set.
    // COMPOSED from the two shared kernels ([[deconEvalSurface]] +
    // [[deconFlagBatch]]) that the streaming screen
    // (graft.streaming.StreamingDecon) also rides — ONE definition of the
    // probe surface and the flag arithmetic, so the stream==batch law can
    // never silently diverge from the batch gate (r12 ADVICE: the first
    // cut kept an inline duplicate of both kernels here).
    "q135_semantic_decon" -> ((s, dir) => {
      val rows = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") % DeconEvery =!= 0 || col("vec_id") >= DeconEvalMax)
        .select("vec_id", "embedding")
      deconFlagBatch(s, rows, deconEvalSurface(s, dir)).orderBy("vec_id")
    }),

    // Semantic source-overlap matrix with the int8 two-stage candidate
    // verify — see [[semSrc]] for the pipeline and the losslessness
    // argument.
    "q140_semantic_src_matrix" -> ((s, dir) => semSrc(s, dir).matrix),

    // ANN index quality monitor: recall@k of the LSH ANN (q50) against the
    // exact top-k (q31) per query — the eval loop every production ANN
    // deployment runs after (re)building an index. Composes the two
    // existing pipelines unchanged (same plans, same broadcasts) and adds
    // only a left-semi membership probe + a per-query count; output is
    // |queries| rows, so the join tail is trivially broadcastable at any
    // corpus scale (the cost IS the two component pipelines).
    "q137_ann_recall" -> ((s, dir) => {
      val exact = queries("q31_cosine_topk")(s, dir).select("q_id", "nbr_id")
      val lsh = queries("q50_hyperplane_lsh_topk")(s, dir).select("q_id", "nbr_id")
      val m = exact.join(lsh, Seq("q_id", "nbr_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_matched"))
      exact.select("q_id").distinct()
        .join(m, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_matched"), lit(0L)).as("n_matched"),
          round(coalesce(col("n_matched"), lit(0L)) / TopK.toDouble, 4)
            .as("recall_at_k"))
        .orderBy("q_id")
    })
  )

  /** Hyperplane-LSH coding shared by q50 (top-k ANN) and q135 (semantic
    * decontamination): code = NumPlanes sign bits of md5-derived
    * pseudo-random hyperplane dot products — deterministic (no shared RNG
    * state on a cluster) and exactly reproducible by the DuckDB oracle.
    */
  private def lshCoded(s: SparkSession, e: DataFrame): DataFrame = {
    val dim = 64
    // plane components in [-0.5, 0.5): md5-derived per (plane, dim)
    val planes = broadcast(s.range(NumPlanes).toDF("plane").select(
      col("plane"),
      array((0 until dim).map(d =>
        (conv(substring(md5(concat(lit(s"pl:$d:"), col("plane"))), 1, 8), 16, 10)
          .cast("long").cast("double") / 4294967296.0) - 0.5): _*).as("pv")))
    val coded = e.crossJoin(planes)
      .withColumn("bit",
        when(dotNative(col("v"), col("pv")) >= 0,
          expr("shiftleft(1L, cast(plane as int))")).otherwise(0L))
      .groupBy("vec_id").agg(sum("bit").as("code"))
    e.join(coded, "vec_id")
  }

  /** A code plus all its 1-bit flips — the multi-probe set. */
  private def lshProbes(code: Column): Column =
    array(code +: (0 until NumPlanes).map(b => code.bitwiseXOR(lit(1L << b))): _*)

  /** AND-OR banded hyperplane coding (q135/q140): one row per
    * (vector, band), code = the band's `bits` sign bits over `codeCol`.
    * Same md5 plane family as `lshCoded` (planes 0 until bands·bits),
    * one extra `band` group key.
    *
    * The planes are md5-derived CONSTANTS, so they are computed at plan
    * build and unrolled into per-band literal-dot expressions — the whole
    * coding is one map-side projection + posexplode (r16: the previous
    * form crossJoined every doc with bands·bits plane ROWS, shuffled
    * n·bands·bits rows through a groupBy(vec_id, band) and joined the
    * codes back by id — two corpus-extent exchanges for values that are a
    * pure function of the row). Bit-identical codes: same plane values
    * (Round16Spec pins the literal == SQL-md5 derivation), same ≥ 0 sign
    * rule, and integer bit sums commute.
    */
  private def deconCoded(s: SparkSession, e: DataFrame,
    bits: Int = DeconBandBits, bands: Int = DeconBands,
    codeCol: String = "v"): DataFrame = {
    val codeCols = (0 until bands).map { bnd =>
      (0 until bits).map { bit =>
        when(dotNative(col(codeCol),
          typedLit(planeVector(bnd * bits + bit))) >= 0,
          lit(1L << bit)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    e.select(col("*"), posexplode(array(codeCols: _*)).as(Seq("bandp", "code")))
      .withColumn("band", col("bandp").cast("long")).drop("bandp")
  }

  /** Plane `p`'s 64 components, computed driver-side — EXACTLY the SQL
    * derivation (`planeComp`: first 8 md5 hex chars of "pl:<d>:<p>" as a
    * 32-bit integer / 2^32 − 0.5) so the DuckDB oracle and any historic
    * coded output replay bit-for-bit.
    */
  private[graft] def planeVector(p: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(64) { d =>
      val hex = md.digest(s"pl:$d:$p".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** The q135 benchmark PROBE SURFACE — eval vectors with their banded
    * codes expanded to the (code ∪ 1-bit-flip) multi-probe set. Shared by
    * batch q135's candidate join and the streaming screen
    * ([[graft.streaming.StreamingDecon]]), which computes it ONCE at
    * start (an eval suite is fixed; ≤ DeconEvalMax/DeconEvery rows —
    * broadcast-sized by construction).
    */
  private[graft] def deconEvalSurface(s: SparkSession, dir: String): DataFrame =
    deconCoded(s, corpus(s, dir))
      .filter(col("vec_id") % DeconEvery === 0 && col("vec_id") < DeconEvalMax)
      .select(col("vec_id").as("eval_id"), col("v").as("ev"),
        col("n").as("en"), col("band"), col("code"))
      .withColumn("probe", explode(array(
        col("code") +: (0 until DeconBandBits)
          .map(b => col("code").bitwiseXOR(lit(1L << b))): _*)))
      .drop("code")

  /** Flag arbitrary embedding rows (`vec_id`, `embedding`) against a
    * prepared probe surface: code the rows with the SAME md5 plane family,
    * broadcast-join on (band, probe), exact-cosine ≥ DeconTau, best match
    * per vector. Per-vector — a row's verdict depends only on the fixed
    * surface, never its batch cohort — so any batching yields identical
    * flags (the streaming spec's stream==batch law).
    */
  private[graft] def deconFlagBatch(s: SparkSession, rows: DataFrame,
    surface: DataFrame): DataFrame = {
    graft.functions.DotProductExpression.register(s)
    val e = rows.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", l2NormNative(col("v")))
    val coded = deconCoded(s, e)
    val cand = coded
      .join(broadcast(surface),
        coded("band") === surface("band") && col("code") === col("probe"))
      .select(col("vec_id"), col("eval_id"),
        (dotNative(col("ev"), col("v")) / (col("en") * col("n"))).as("cos"))
      .distinct()
      .filter(round(col("cos"), 4) >= DeconTau)
    val w = Window.partitionBy("vec_id")
      .orderBy(round(col("cos"), 6).desc, col("eval_id").asc)
    cand.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("vec_id"), col("eval_id"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Adaptive band width for the banded SELF-joins (q140): the smallest
    * bit count keeping the expected (band, code) bucket at ≤ ~64 vectors,
    * so candidate mass stays Bands·n·bucket — LINEAR in corpus size where
    * fixed bits would be n²/2^Bits (measured: fixed 4 bits cost 7.9 s at
    * sf0.1 and a projected quadratic blow-up a decade up). Exact integer
    * arithmetic (bit width of ⌈n/64⌉−1 via binary-string length) — no
    * float log2 whose boundary rounding could diverge between engines.
    * The recall trade is documented at the call site: per-band collision
    * falls as bits grow, so deployments holding recall fixed raise Bands
    * alongside (the committed Bands=4 pins spec recall at the oracle
    * scale, where bits stays at the 4-bit floor).
    *
    * CEILING: 16 bits, matching the oracle's plane family
    * (range(0, Bands·16)) — past ~4.2M docs (64·2^16) buckets grow past
    * 64 again rather than the two engines silently using different plane
    * sets (r11 ADVICE). A deployment that big raises the ceiling and the
    * oracle's range bound TOGETHER.
    */
  private[graft] def adaptiveBandBits(nDocs: Long): Int = {
    val m = math.max(1L, (nDocs + 63) / 64 - 1)
    math.min(16, math.max(DeconBandBits, java.lang.Long.toBinaryString(m).length))
  }

  /** The q140 pipeline, exposed stage-by-stage so Round16Spec can pin the
    * two-stage-verify laws (candidate mass vs survivor mass; prefilter
    * losslessness as RESULT EQUALITY with `prefilter = false`).
    */
  private[graft] case class SemSrc(candidates: DataFrame,
    survivors: DataFrame, matrix: DataFrame)

  /** Semantic source-overlap matrix — the embedding twin of q106's
    * lexical provenance matrix, and the end-to-end proof that the q139
    * hash embedder feeds the vector dedup stack with NO model embeddings
    * anywhere: docs → hash embeddings → AND-OR banded codes (q135's
    * scheme, self-joined) → int8 PREFILTER → exact-cosine threshold → per
    * source-pair counts. Scale shape: candidate generation is a
    * (band, code) self equi-join — Bands·n²/2^Bits expected candidate
    * mass, the standard banded-LSH bound with Bits as the dial — and the
    * matrix rollup collapses to |sources|² rows.
    *
    * TWO-STAGE CANDIDATE VERIFY (r15 verdict item 4): each side of the
    * banded self-join carries symmetric-int8 quantization columns — q_i =
    * round(v_i/sc) at sc = max|v|/127, the EXACT residual norm er =
    * ‖v − sc·q‖ from the very q that shipped, and ‖v‖ — so a candidate
    * costs one integer `vec_dot_i8` (64 byte multiply-adds) instead of a
    * 64-double dot, and, the larger win at scale, the join shuffles
    * ~70-byte code rows instead of 512-byte double arrays. The full
    * vectors join back by id for the SURVIVORS only (late
    * materialization, the q27/q59 array-form precedent). The prune is
    * PROVABLY LOSSLESS, not a recall trade: dot(a,b) = dot(qa',qb') +
    * dot(qa',eb) + dot(ea,b) with qx' = sx·qx, so dot(a,b) ≤ sa·sb·dotq +
    * (na+era)·erb + era·nb (Cauchy–Schwarz on the residual terms, every
    * norm a carried scalar) — a pair is dropped only when this certified
    * upper bound cannot reach the 0.89995·na·nb threshold even in
    * principle (1e-9 slack absorbs double rounding in the bound itself).
    * The final predicate and the DuckDB oracle are therefore UNCHANGED;
    * Round16Spec pins bound soundness, result equality with the
    * unfiltered pipeline, and that the filter actually bites.
    */
  /** The per-doc semantic-matrix INPUT table — unit vector, l2 norm,
    * source, quantized-integer-mean-centered vector, int8 codes, exact
    * residual norm — a pure function of the corpus, MEMOIZED per
    * (session, sf dir) exactly like the hashEmbedDense table it derives
    * from (fit-once warehouse semantics: production materializes the
    * embedding + code columns once at embed time, and every matrix run
    * reads the same table; Bench warm-up populates the cache via
    * [[warm]], so the timed region is coding + join + verify — the
    * per-query work).
    *
    * Mean-centering note (r11 ADVICE): the per-dimension mean uses a
    * QUANTIZED INTEGER sum (floor to a 1e-9 grid, sum longs, divide
    * once) — a plain avg() is an order-dependent cross-row double sum
    * whose last-ulp drift under re-partitioning can flip sign bits for
    * docs near the mean. The oracle quantizes identically (hmean CTE).
    */
  private val semSrcMemo =
    scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]()
  Memos.register(s => semSrcMemo.keys.filter(_._1 eq s)
    .foreach(k => semSrcMemo.remove(k).foreach(_.unpersist())))
  private[graft] def semSrcInput(s: SparkSession, dir: String): DataFrame =
    semSrcMemo.getOrElseUpdate((s, dir), {
      Memos.hook(s)
      graft.functions.DotProductExpression.register(s)
      val e = TextQueries.hashEmbedDense(s, dir)
        .select(col("doc_id").as("vec_id"), col("source"), col("v"))
        .withColumn("n", l2NormNative(col("v")))
        // r16 ADVICE: u = sc/n and err = er/n divide by n downstream — a
        // zero-norm embedding would yield NaN scalars that pass both the
        // prefilter and the NaN-is-greatest exact gate. hashEmbedDense
        // emits unit vectors, so this enforces the invariant where the
        // columns are built rather than relying on it implicitly.
        .filter(col("n") > 0)
      val mean = broadcast(e.select(posexplode(col("v")))
        .groupBy(col("pos").cast("long").as("pos"))
        .agg(round(
          sum(floor(col("col") * 1e9).cast("long")).cast("double")
            / 1e9 / count(lit(1)), 9).as("m"))
        .agg(map_from_entries(collect_list(struct(col("pos"), col("m")))).as("mm"))
        .select(transform(sequence(lit(0L), lit(63L)),
          d => element_at(col("mm"), d)).as("mv")))
      e.crossJoin(mean)
        .withColumn("vc", zip_with(col("v"), col("mv"), (a, b) => a - b))
        .withColumn("ma", array_max(transform(col("v"), x => abs(x))))
        .withColumn("sc", col("ma") / lit(127.0))
        .withColumn("q", when(col("ma") > 0,
            transform(col("v"), x => round(x / col("sc")).cast("byte")))
          .otherwise(transform(col("v"), _ => lit(0).cast("byte"))))
        .withColumn("er", when(col("ma") > 0, sqrt(aggregate(
            zip_with(col("v"), col("q"),
              (x, qq) => pow(x - qq.cast("double") * col("sc"), lit(2))),
            lit(0.0), (acc, z) => acc + z))).otherwise(col("n")))
        .drop("mv")
        .cache()
    })

  /** Bench warm-up hook: populate the shared input table (the fit-once
    * cost, never any single run's engine time).
    */
  private[graft] def warm(s: SparkSession, dir: String): Unit = {
    semSrcInput(s, dir).count()
    ()
  }

  private[graft] def semSrc(s: SparkSession, dir: String,
    prefilter: Boolean = true): SemSrc = {
    graft.functions.DotProductExpression.register(s)
    graft.functions.Int8DotExpression.register(s)
    // adaptive band width: ~64-doc buckets at any corpus size (one
    // bounded metadata count on the driver, q113's ivf2KG precedent)
    val bits = adaptiveBandBits(graft.Tables.load(s, dir, "documents").count())
    val e = semSrcInput(s, dir)
    val qz = e
    // NORMALIZED per-side scalars so the banded join carries the bare
    // minimum — id, q (64 int8), u = sc/‖v‖, e' = er/‖v‖, band, code; the
    // bound divided through by na·nb > 0 becomes ua·ub·dotq + (1+ea')·eb'
    // + ea' ≥ 0.89995 − 2e-9 (the 2e-9 relaxation dominates 1e-9/(na·nb)
    // for the unit-normalized embeddings and only ever ADMITS more).
    // Sources and vectors both join back by id for survivors only.
    val qn = qz.withColumn("u", col("sc") / col("n"))
      .withColumn("err", col("er") / col("n"))
    val coded = deconCoded(s, qn, bits, SemSrcBands, "vc")
    val a = coded.select(col("vec_id").as("a_id"), col("q").as("qa"),
      col("u").as("ua"), col("err").as("ea"), col("band"), col("code"))
    val b = coded.select(col("vec_id").as("b_id"), col("q").as("qb"),
      col("u").as("ub"), col("err").as("eb"),
      col("band").as("band_b"), col("code").as("code_b"))
    val eqCond = col("band") === col("band_b") &&
      col("code") === col("code_b") && col("a_id") < col("b_id")
    val prefCond = col("ua") * col("ub") * dotI8Native(col("qa"), col("qb")) +
      (lit(1.0) + col("ea")) * col("eb") + col("ea") >=
      lit(certBound(SemSrcTau))
    val cands = a.join(b, eqCond)
    // the prefilter runs INSIDE the join condition: a failing candidate
    // is dropped before its output row is ever projected downstream
    val surv = (if (prefilter) a.join(b, eqCond && prefCond) else cands)
      .select("a_id", "b_id")
      .distinct()
    // exact verify on prefilter survivors only — the 64-double arrays
    // (and the source labels) enter the plan here, keyed by id, never
    // through the banded shuffle
    val cand = surv
      .join(e.select(col("vec_id").as("a_id"), col("v").as("va"),
        col("n").as("na"), col("source").as("src_a")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("v").as("vb"),
        col("n").as("nb"), col("source").as("src_b")), "b_id")
      .withColumn("cos",
        dotNative(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(round(col("cos"), 4) >= SemSrcTau)
    val matrix = cand.groupBy(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
    SemSrc(cands, surv, matrix)
  }

  /** Shared top-k tail of the oracle SQL (rank by rounded cosine, nbr tie). */
  private def topKSql(candCte: String): String =
    s"""$candCte
       SELECT q_id, rnk, nbr_id, round(cos, 4) AS cos_sim FROM (
         SELECT q_id, nbr_id, cos, row_number() OVER (
           PARTITION BY q_id ORDER BY round(cos, 6) DESC, nbr_id) rnk FROM cand)
       WHERE rnk <= $TopK ORDER BY q_id, rnk"""

  /** One hyperplane component, identical to the Spark formula (exact
    * doubles: 32-bit md5 prefix / 2^32 − 0.5).
    */
  private def planeComp(d: Int): String =
    s"CAST(('0x' || substr(md5('pl:$d:' || plane), 1, 8)) AS BIGINT)/4294967296.0 - 0.5"

  /** Exact brute-force top-k SQL — referenced standalone (q31) and nested as
    * the ground-truth side of the recall eval (q137).
    */
  private def q31Sql: String = topKSql(
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       cand AS (SELECT q.vec_id q_id, e.vec_id nbr_id,
               list_cosine_similarity(q.v, e.v) cos
             FROM e q, e WHERE q.vec_id < $NumQueries AND e.vec_id <> q.vec_id)""")

  val oracles: Map[String, String] = Map(
    "q31_cosine_topk" -> q31Sql,

    "q32_ivf_topk" -> topKSql(
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         comp AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
         cent AS (SELECT label AS c_id, list(cx ORDER BY pos) AS cv
                  FROM (SELECT label, pos, round(avg(x), 9) AS cx
                        FROM comp GROUP BY label, pos)
                  GROUP BY label),
         ranked AS (SELECT vec_id, v, c_id, row_number() OVER (
                      PARTITION BY vec_id
                      ORDER BY round(list_cosine_similarity(v, cv), 6) DESC, c_id) AS rn
                    FROM e CROSS JOIN cent),
         assigned AS (SELECT vec_id, v, c_id AS bucket FROM ranked WHERE rn = 1),
         q AS (SELECT vec_id AS q_id, v AS qv, c_id AS bucket FROM ranked
               WHERE vec_id < $NumQueries AND rn <= $NProbe),
         cand AS (SELECT q.q_id, a.vec_id AS nbr_id,
                    list_cosine_similarity(q.qv, a.v) AS cos
                  FROM assigned a JOIN q ON a.bucket = q.bucket
                  WHERE a.vec_id <> q.q_id)"""),

    "q107_pq_codes" -> {
      val codeCols = (0 until PqSubspaces)
        .map(sp => s"max(CASE WHEN sp = $sp THEN c_id END) AS code$sp")
        .mkString(",\n           ")
      val distSum = (0 until PqSubspaces)
        .map(sp => s"max(CASE WHEN sp = $sp THEN rd2 END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         sub AS (SELECT vec_id, sp, list_slice(v, sp*$PqSubDim + 1, sp*$PqSubDim + $PqSubDim) AS sv
                 FROM e CROSS JOIN range(0, $PqSubspaces) t(sp)),
         cent AS (SELECT sp, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < $PqK),
         r AS (SELECT s.vec_id, s.sp, c.c_id,
                 list_dot_product(s.sv, s.sv) - 2.0 * list_dot_product(s.sv, c.cv)
                   + list_dot_product(c.cv, c.cv) AS d2
               FROM sub s JOIN cent c USING (sp)),
         b AS (SELECT vec_id, sp, c_id, round(d2, 6) AS rd2, row_number() OVER (
                 PARTITION BY vec_id, sp ORDER BY round(d2, 6), c_id) AS rn FROM r)
         SELECT vec_id,
           $codeCols,
           round($distSum, 6) AS distortion
         FROM b WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id"""
    },

    "q109_hard_negatives" -> topKSql(
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         cand AS (SELECT q.vec_id q_id, e.vec_id nbr_id,
                 list_cosine_similarity(q.v, e.v) cos
               FROM e q, e WHERE q.vec_id < $NumQueries AND e.label <> q.label)"""),

    "q104_embedding_outliers" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         comp AS (SELECT label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
         cent AS (SELECT label, list(cx ORDER BY pos) AS cv
                  FROM (SELECT label, pos, round(avg(x), 9) AS cx
                        FROM comp GROUP BY label, pos)
                  GROUP BY label),
         sc AS (SELECT vec_id, e.label, list_cosine_similarity(v, cv) AS cos
                FROM e JOIN cent USING (label)),
         rk AS (SELECT vec_id, label, cos, row_number() OVER (
                  PARTITION BY label ORDER BY round(cos, 6), vec_id) AS rnk FROM sc)
         SELECT vec_id, label, round(cos, 4) AS cos_centroid, rnk,
           CASE WHEN rnk <= $OutlierK THEN 1 ELSE 0 END AS outlier
         FROM rk ORDER BY label, rnk""",

    "q73_kmeans_train" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $KMeansK),
         r1 AS (SELECT vec_id, v, c_id, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent0 c)),
         a1 AS (SELECT vec_id, v, c_id FROM r1 WHERE rn = 1),
         comp AS (SELECT c_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                  FROM a1),
         cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                   FROM (SELECT c_id, pos, round(avg(x), 9) AS cx
                         FROM comp GROUP BY c_id, pos)
                   GROUP BY c_id),
         r2 AS (SELECT vec_id, c_id, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent1 c))
         SELECT c_id, count(*) AS n_members, round(avg(d2), 6) AS avg_d2
         FROM r2 WHERE rn = 1 GROUP BY c_id ORDER BY c_id""",

    "q146_cluster_coreset" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $KMeansK),
         r1 AS (SELECT vec_id, v, c_id, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent0 c)),
         a1 AS (SELECT vec_id, v, c_id FROM r1 WHERE rn = 1),
         comp AS (SELECT c_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                  FROM a1),
         cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                   FROM (SELECT c_id, pos, round(avg(x), 9) AS cx
                         FROM comp GROUP BY c_id, pos)
                   GROUP BY c_id),
         r2 AS (SELECT vec_id, c_id, d2, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent1 c)),
         a2 AS (SELECT vec_id, c_id, d2 FROM r2 WHERE rn = 1),
         rk AS (SELECT vec_id, c_id, d2,
                  row_number() OVER (PARTITION BY c_id
                    ORDER BY round(d2, 6), vec_id) AS rnk,
                  count(*) OVER (PARTITION BY c_id) AS csize
                FROM a2)
         SELECT vec_id, c_id, CAST(rnk AS BIGINT) AS rnk,
           (rnk - 1) * 100 < csize * $CoresetPct AS kept,
           round(d2, 6) AS d2
         FROM rk ORDER BY vec_id""",

    "q97_semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $KMeansK),
         r1 AS (SELECT vec_id, v, c_id, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent0 c)),
         a1 AS (SELECT vec_id, v, c_id FROM r1 WHERE rn = 1),
         comp AS (SELECT c_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                  FROM a1),
         cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                   FROM (SELECT c_id, pos, round(avg(x), 9) AS cx
                         FROM comp GROUP BY c_id, pos)
                   GROUP BY c_id),
         r2 AS (SELECT vec_id, v, c_id, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent1 c)),
         a2 AS (SELECT vec_id, v, c_id FROM r2 WHERE rn = 1),
         dups AS (SELECT a.vec_id, min(b.vec_id) AS dup_of
                  FROM a2 a JOIN a2 b
                    ON a.c_id = b.c_id AND a.vec_id > b.vec_id
                  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $SemDedupTau
                  GROUP BY a.vec_id)
         SELECT a.vec_id, a.c_id, d.dup_of
         FROM a2 a LEFT JOIN dups d USING (vec_id) ORDER BY a.vec_id""",

    "q113_clustered_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < $NearDupStripeMax),
         cent0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id <
           (SELECT greatest($KMeansK, count(*) // $NearDupClusterSize) FROM e)),
         r1 AS (SELECT vec_id, v, c_id, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent0 c)),
         a1 AS (SELECT vec_id, v, c_id FROM r1 WHERE rn = 1),
         comp AS (SELECT c_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                  FROM a1),
         cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                   FROM (SELECT c_id, pos, round(avg(x), 9) AS cx
                         FROM comp GROUP BY c_id, pos)
                   GROUP BY c_id),
         r2 AS (SELECT vec_id, v, c_id, row_number() OVER (
                  PARTITION BY vec_id ORDER BY round(d2, 6), c_id) AS rn
                FROM (SELECT e.vec_id, e.v, c.c_id,
                        list_dot_product(e.v, e.v)
                          - 2.0 * list_dot_product(e.v, c.cv)
                          + list_dot_product(c.cv, c.cv) AS d2
                      FROM e CROSS JOIN cent1 c)),
         a2 AS (SELECT vec_id, v, c_id FROM r2 WHERE rn <= $NearDupProbes)
         SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
         FROM a2 a JOIN a2 b
           ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $NearDupTau
         ORDER BY a_id, b_id""",

    // Replays the full two-level pipeline: coarse training over the corpus
    // (first-G seed → one Lloyd step → coarse1), the CoarseProbes group
    // pre-selection, the RESTRICTED fine Lloyd step (vectors × seeds of
    // their probed groups only), the restricted final assign against the
    // trained fine centroids, and the same pair tail as q113. The
    // multiply-referenced CTEs are MATERIALIZED — DuckDB re-inlines them
    // otherwise and the nested-window plan blows up exponentially.
    "q129_ivf2_neardup" -> Ivf2OracleSql,

    // q130 serves q129's training output from the persistent index — the
    // ground truth is the same end-to-end derivation.
    "q130_ann_serve" -> Ivf2OracleSql,
  ) ++ moreOracles

  /** q129/q130 shared ground truth: the full two-level derivation replayed
    * in DuckDB (coarse training, probe pre-selection, restricted fine
    * training, restricted final assign, pair tail).
    */
  private lazy val Ivf2OracleSql: String =
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         coarse0 AS (SELECT vec_id AS g_id, v AS gv FROM e WHERE vec_id <
           (SELECT CAST(ceil(sqrt(
              greatest($KMeansK, count(*) // $NearDupClusterSize))) AS BIGINT)
            FROM embeddings)),
         cr1 AS (SELECT vec_id, v, g_id, row_number() OVER (
                   PARTITION BY vec_id ORDER BY round(d2, 6), g_id) AS rn
                 FROM (SELECT e.vec_id, e.v, c.g_id,
                         list_dot_product(e.v, e.v)
                           - 2.0 * list_dot_product(e.v, c.gv)
                           + list_dot_product(c.gv, c.gv) AS d2
                       FROM e CROSS JOIN coarse0 c)),
         ca1 AS (SELECT vec_id, v, g_id FROM cr1 WHERE rn = 1),
         ccomp AS (SELECT g_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                   FROM ca1),
         coarse1 AS MATERIALIZED (SELECT g_id, list(cx ORDER BY pos) AS gv
                     FROM (SELECT g_id, pos, round(avg(x), 9) AS cx
                           FROM ccomp GROUP BY g_id, pos)
                     GROUP BY g_id),
         vp AS MATERIALIZED (SELECT vec_id, v, g_id FROM (
                  SELECT e.vec_id, e.v, c.g_id, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY round(
                      list_dot_product(e.v, e.v)
                        - 2.0 * list_dot_product(e.v, c.gv)
                        + list_dot_product(c.gv, c.gv), 6), c.g_id) AS rn
                  FROM e CROSS JOIN coarse1 c)
                WHERE rn <= $CoarseProbes),
         sg AS (SELECT c_id, cv, g_id FROM (
                  SELECT s.vec_id AS c_id, s.v AS cv, c.g_id, row_number() OVER (
                    PARTITION BY s.vec_id ORDER BY round(
                      list_dot_product(s.v, s.v)
                        - 2.0 * list_dot_product(s.v, c.gv)
                        + list_dot_product(c.gv, c.gv), 6), c.g_id) AS rn
                  FROM (SELECT vec_id, v FROM e WHERE vec_id <
                          (SELECT greatest($KMeansK, count(*) // $NearDupClusterSize)
                           FROM embeddings)) s
                    CROSS JOIN coarse1 c)
                WHERE rn = 1),
         tr AS (SELECT vec_id, v, c_id FROM (
                  SELECT vp.vec_id, vp.v, s.c_id, row_number() OVER (
                    PARTITION BY vp.vec_id ORDER BY round(
                      list_dot_product(vp.v, vp.v)
                        - 2.0 * list_dot_product(vp.v, s.cv)
                        + list_dot_product(s.cv, s.cv), 6), s.c_id) AS rn
                  FROM vp JOIN sg s USING (g_id))
                WHERE rn = 1),
         tcomp AS (SELECT c_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
                   FROM tr),
         cent1 AS (SELECT c_id, list(cx ORDER BY pos) AS cv
                   FROM (SELECT c_id, pos, round(avg(x), 9) AS cx
                         FROM tcomp GROUP BY c_id, pos)
                   GROUP BY c_id),
         fg AS (SELECT c_id, cv, g_id FROM (
                  SELECT f.c_id, f.cv, c.g_id, row_number() OVER (
                    PARTITION BY f.c_id ORDER BY round(
                      list_dot_product(f.cv, f.cv)
                        - 2.0 * list_dot_product(f.cv, c.gv)
                        + list_dot_product(c.gv, c.gv), 6), c.g_id) AS rn
                  FROM cent1 f CROSS JOIN coarse1 c)
                WHERE rn = 1),
         a2 AS MATERIALIZED (SELECT vec_id, v, c_id FROM (
                  SELECT vp.vec_id, vp.v, f.c_id, row_number() OVER (
                    PARTITION BY vp.vec_id ORDER BY round(
                      list_dot_product(vp.v, vp.v)
                        - 2.0 * list_dot_product(vp.v, f.cv)
                        + list_dot_product(f.cv, f.cv), 6), f.c_id) AS rn
                  FROM vp JOIN fg f USING (g_id))
                WHERE rn <= $NearDupProbes)
         SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
         FROM a2 a JOIN a2 b
           ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         WHERE round(list_cosine_similarity(a.v, b.v), 4) >= $NearDupTau
         ORDER BY a_id, b_id"""

  private def moreOracles: Map[String, String] = Map(
    "q72_embedding_quantize" ->
      """SELECT label, count(*) AS n_vecs, round(avg(rmse), 6) AS avg_rmse,
           round(avg(maxabs), 6) AS avg_maxabs
         FROM (SELECT label, maxabs,
                 sqrt(list_aggregate(list_transform(v,
                   x -> pow(x - round(x * (127.0 / maxabs)) / (127.0 / maxabs), 2)),
                   'sum') / len(v)) AS rmse
               FROM (SELECT label, v,
                       list_max(list_transform(v, x -> abs(x))) AS maxabs
                     FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                           FROM embeddings))
               WHERE maxabs > 0)
         GROUP BY label ORDER BY label""",

    "q50_hyperplane_lsh_topk" -> q50Sql,

    // Semantic decontamination: AND-OR banded hyperplane codes (one row per
    // vector × band), candidate if any band matches ± one flipped bit, a
    // threshold filter in place of the top-k, best-benchmark-match per
    // flagged corpus vector.
    "q135_semantic_decon" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
         planes AS (SELECT plane,
                      list_value(${(0 until 64).map(planeComp).mkString(", ")}) AS pv
                    FROM range(0, ${DeconBands * DeconBandBits}) t(plane)),
         coded AS (SELECT e.vec_id, CAST(p.plane // $DeconBandBits AS BIGINT) AS band,
                     CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                       THEN CAST(1 AS BIGINT) << CAST(p.plane % $DeconBandBits AS INT)
                       ELSE 0 END) AS BIGINT) AS code
                   FROM e CROSS JOIN planes p
                   GROUP BY e.vec_id, p.plane // $DeconBandBits),
         ce AS (SELECT e.vec_id, e.v, c.band, c.code
                FROM e JOIN coded c USING (vec_id)),
         q AS (SELECT vec_id AS eval_id, v AS ev, band,
                 unnest(list_value(code, ${(0 until DeconBandBits)
                   .map(b => s"xor(code, ${1L << b})").mkString(", ")})) AS probe
               FROM ce WHERE vec_id % $DeconEvery = 0 AND vec_id < $DeconEvalMax),
         cand AS (SELECT DISTINCT ce.vec_id, q.eval_id,
                    list_cosine_similarity(q.ev, ce.v) AS cos
                  FROM ce JOIN q ON ce.band = q.band AND ce.code = q.probe
                  WHERE ce.vec_id % $DeconEvery <> 0 OR ce.vec_id >= $DeconEvalMax),
         f AS (SELECT vec_id, eval_id, cos, row_number() OVER (
                 PARTITION BY vec_id ORDER BY round(cos, 6) DESC, eval_id) AS rn
               FROM cand WHERE round(cos, 4) >= $DeconTau)
         SELECT vec_id, eval_id, round(cos, 4) AS cos_sim
         FROM f WHERE rn = 1 ORDER BY vec_id""",

    // Semantic source matrix: the shared embedder CTE chain (ONE SQL
    // rendering, TextQueries.hashEmbedCteSql), banded coding over the
    // embedding lists, self-join, threshold, matrix rollup.
    "q140_semantic_src_matrix" ->
      s"""WITH ${TextQueries.hashEmbedCteSql},
         nb AS (SELECT LEAST(16, GREATEST($DeconBandBits, length(format('{:b}',
                  GREATEST(1, (count(*) + 63) // 64 - 1))))) AS bits
                FROM documents),
         planes AS (SELECT plane,
                      list_value(${(0 until 64).map(planeComp).mkString(", ")}) AS pv
                    FROM range(0, ${SemSrcBands * 16}) t(plane)
                    WHERE plane < (SELECT $SemSrcBands * bits FROM nb)),
         hmean AS (SELECT list(m ORDER BY pos) AS mv FROM (
                     SELECT pos, round(CAST(sum(CAST(floor(x * 1000000000.0)
                         AS BIGINT)) AS DOUBLE) / 1000000000.0 / count(*), 9) AS m
                     FROM (SELECT generate_subscripts(v, 1) AS pos,
                             unnest(v) AS x FROM hemb)
                     GROUP BY pos) t),
         hembc AS (SELECT h.doc_id,
                     list_transform(range(1, 65), i -> h.v[i] - m.mv[i]) AS vc
                   FROM hemb h CROSS JOIN hmean m),
         codedraw AS (SELECT e.doc_id,
                        CAST(p.plane // b.bits AS BIGINT) AS band,
                        CAST(p.plane % b.bits AS INT) AS bp,
                        list_dot_product(e.vc, p.pv) AS dp
                      FROM hembc e CROSS JOIN planes p CROSS JOIN nb b),
         coded AS (SELECT doc_id, band,
                     CAST(sum(CASE WHEN dp >= 0
                       THEN CAST(1 AS BIGINT) << bp ELSE 0 END) AS BIGINT) AS code
                   FROM codedraw GROUP BY doc_id, band),
         ce AS (SELECT e.doc_id, e.source, e.v, c.band, c.code
                FROM hemb e JOIN coded c USING (doc_id)),
         cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                    a.source AS src_a, b.source AS src_b,
                    list_cosine_similarity(a.v, b.v) AS cos
                  FROM ce a JOIN ce b
                    ON a.band = b.band AND a.code = b.code AND a.doc_id < b.doc_id)
         SELECT least(src_a, src_b) AS source_a,
           greatest(src_a, src_b) AS source_b, count(*) AS n_pairs
         FROM cand WHERE round(cos, 4) >= $SemSrcTau
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // Recall@k of the LSH ANN vs the exact top-k: both component pipelines
    // nested verbatim, joined on (q_id, nbr_id) membership.
    "q137_ann_recall" ->
      s"""WITH exact AS ($q31Sql),
         lsh AS ($q50Sql),
         m AS (SELECT e.q_id, count(l.nbr_id) AS n_matched
               FROM exact e LEFT JOIN lsh l
                 ON e.q_id = l.q_id AND e.nbr_id = l.nbr_id
               GROUP BY e.q_id)
         SELECT q_id, CAST(n_matched AS BIGINT) AS n_matched,
           round(n_matched / $TopK.0, 4) AS recall_at_k
         FROM m ORDER BY q_id"""
  )

  /** The shared LSH CTE chain (corpus → planes → codes), nested by q50 and
    * q135 — one SQL rendering of `lshCoded` to keep in sync, not two.
    */
  private def lshCteSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
       planes AS (SELECT plane,
                    list_value(${(0 until 64).map(planeComp).mkString(", ")}) AS pv
                  FROM range(0, $NumPlanes) t(plane)),
       coded AS (SELECT e.vec_id,
                   CAST(sum(CASE WHEN list_dot_product(e.v, p.pv) >= 0
                     THEN CAST(1 AS BIGINT) << CAST(p.plane AS INT) ELSE 0 END) AS BIGINT) AS code
                 FROM e CROSS JOIN planes p GROUP BY e.vec_id),
       ce AS (SELECT e.vec_id, e.v, c.code FROM e JOIN coded c USING (vec_id))"""

  /** LSH top-k SQL — referenced standalone (q50) and nested as the
    * approximate side of the recall eval (q137).
    */
  private def q50Sql: String = topKSql(
    s"""$lshCteSql,
       q AS (SELECT vec_id AS q_id, v AS qv,
               unnest(list_value(code, ${(0 until NumPlanes)
                 .map(b => s"xor(code, ${1L << b})").mkString(", ")})) AS probe
             FROM ce WHERE vec_id < $NumQueries),
       cand AS (SELECT DISTINCT q.q_id, ce.vec_id AS nbr_id,
                  list_cosine_similarity(q.qv, ce.v) AS cos
                FROM ce JOIN q ON ce.code = q.probe WHERE ce.vec_id <> q.q_id)""")
}
