package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-ASSEMBLY operators — the stage after cleaning/dedup where a
  * training-data pipeline turns a document corpus into model-ready token
  * streams: context-window chunking, cross-document sequence packing,
  * temperature-flattened mixture sampling, and per-domain frequency caps.
  * (The reference engine stops at per-entity analytics; these are the
  * beyond-reference LLM-pipeline operators the builder brief asks for,
  * alongside DedupQueries/SimilarityQueries/TextQueries.)
  *
  * All four are pure built-in column pipelines (split/slice/sequence/
  * window/hash) — no UDFs — so they stay inside WholeStageCodegen, and
  * every shuffle is on an explicit bounded key (source, source×shard,
  * source×lang). Oracle determinism follows the house rules: md5-derived
  * hash64 for any sampling decision, integer arithmetic for bin math,
  * and the q101-style sorted-fold whenever doubles cross rows.
  */
object AssemblyQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** q131: context-window length (tokens) and stride (overlap = len−stride). */
  val ChunkLen = 32
  val ChunkStride = 24

  /** q132: tokens per packed training sequence, and the doc-count shard
    * width that bounds each packing window's sequential extent.
    */
  val PackBudget = 256L
  val PackShardDocs = 4096L

  /** q133: target token budget and the temperature exponent (α = 0.5 —
    * sampling probability ∝ √tokens, the standard flattening that
    * up-weights small sources without drowning large ones).
    */
  val MixBudget = 10000L
  val MixSeed = 131

  /** q134: max docs kept per (source, lang) domain. */
  val DomainCap = 3
  val CapSeed = 134

  /** q136: output shard count for the balanced export manifest. */
  val NumShards = 8
  val ShardSeed = 136

  /** q141: total token budget for the epoch plan — deliberately LARGER than
    * the corpus so small sources up-sample past one epoch (the LLaMA/Pile
    * "epochs per source" regime q133's capped-rate form can't express).
    */
  val EpochBudget = 100000L

  /** q149: the remainder-draw seed (q133's draw convention). */
  val ExpandSeed = 149

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Context-window chunking with overlap: every doc becomes ⌈(n−L)/S⌉+1
    // chunks of ≤ L tokens starting every S tokens (trailing chunk keeps
    // the remainder; chunks overlap by L−S tokens so no span longer than
    // the window is ever split mid-context). Narrow per-row transform —
    // the only exchange is the presentation sort; the chunk table
    // partitions exactly like its input at any scale.
    "q131_context_chunks" -> ((s, dir) => {
      val tk = toks(col("text"))
      chunkify(docs(s, dir).select(col("doc_id"), tk.as("tk")))
        .orderBy("doc_id", "chunk_idx")
    }),

    // Cross-document sequence packing (T5/GPT-style pretraining batches):
    // concatenate each (source, shard)'s docs in doc_id order into one
    // token stream and cut it every PackBudget tokens; emit the per-window
    // pack manifest (docs starting in the window, the straddle count —
    // docs crossing a window boundary — and their token mass). The
    // running offset is ONE window function over (source, shard), and the
    // shard key bounds each window's sequential extent to PackShardDocs
    // docs, so a 100 TB corpus packs as thousands of independent
    // partitions instead of one unbounded per-source scan.
    "q132_sequence_pack" -> ((s, dir) => {
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      val d = docs(s, dir).select(col("source"), col("doc_id"),
        shardOf("doc_id").as("shard"),
        size(toks(col("text"))).cast("long").as("nt"))
      d.withColumn("cum", sum("nt").over(w))
        .select(col("source"), col("shard"), col("doc_id"), col("nt"),
          floor((col("cum") - col("nt")).cast("double") / PackBudget)
            .cast("long").as("bin_id"),
          floor((col("cum") - 1).cast("double") / PackBudget)
            .cast("long").as("bin_end"))
        .groupBy("source", "shard", "bin_id")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"),
          sum((col("bin_end") > col("bin_id")).cast("long")).as("n_straddles"),
          sum("nt").as("bin_doc_tokens"))
        .orderBy("source", "shard", "bin_id")
    }),

    // Temperature-flattened mixture sampling (the GPT-3/Pile recipe):
    // per-source weight ∝ tokens^α (α = 0.5), per-source keep-rate =
    // min(1, budget·w/tokens), per-doc keep decided by the deterministic
    // md5 hash — so the oracle replays the whole draw. The 20-row source
    // stats broadcast; the corpus side is one scan + one map-side-combined
    // source rollup. Cross-row double sums use the q101 sorted-fold so
    // both engines add in the same order.
    "q133_mixture_rates" -> ((s, dir) => {
      val perDoc = docs(s, dir).select(col("source"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("nt"))
      val stats = perDoc.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .withColumn("sq", sqrt(col("n_tokens").cast("double")))
      val tot = broadcast(stats.agg(
        aggregate(sort_array(collect_list(struct(col("source"), col("sq")))),
          lit(0.0), (a, x) => a + x.getField("sq")).as("tot")))
      val rates = broadcast(stats.crossJoin(tot)
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(least(lit(1.0),
            lit(MixBudget) * col("sq") / col("tot") / col("n_tokens").cast("double")),
            9).as("rate")))
      val kept = hash64(col("doc_id").cast("string"), MixSeed) % 1000000L <
        floor(col("rate") * 1000000)
      perDoc.join(rates, "source")
        .groupBy("source", "n_docs", "n_tokens", "rate")
        .agg(sum(kept.cast("long")).as("n_kept"),
          sum(when(kept, col("nt")).otherwise(0L)).as("kept_tokens"))
        .orderBy("source")
    }),

    // Per-domain frequency caps (Common-Crawl-style URL/host capping,
    // keyed here by source×lang): keep at most DomainCap docs per domain,
    // chosen by deterministic hash order so the sample is stable across
    // runs and replayable by the oracle. One shuffle on the domain key;
    // at 100 TB a skewed domain serializes its own partition only — and
    // since every row beyond rank Cap is dropped, the scale path is a
    // per-input-partition pre-top-Cap (partial TakeOrdered) feeding this
    // same window, which AQE's skew splitter already approximates.
    "q134_domain_caps" -> ((s, dir) => {
      val wd = Window.partitionBy("source", "lang")
        .orderBy(col("h"), col("doc_id"))
      docs(s, dir).select(col("source"), col("lang"), col("doc_id"),
          (hash64(col("doc_id").cast("string"), CapSeed) % 1000000L).as("h"))
        .withColumn("rn", row_number().over(wd).cast("long"))
        .filter(col("rn") <= DomainCap)
        .select(col("source"), col("lang"), col("doc_id"), col("rn"))
        .orderBy("source", "lang", "rn")
    }),

    // Balanced shard export manifest: the final write of a curated corpus
    // wants N output shards with near-equal doc/token mass AND source mix
    // (so any shard subset is an unbiased corpus sample). Docs round-robin
    // over shards in per-SOURCE deterministic hash order — per-source doc
    // counts differ by ≤1 across shards by construction, and hash order
    // makes token mass even out without a global sort: the only window
    // partitions by source (each source's extent, never the whole corpus),
    // and the manifest rollup is a map-side-combined NumShards-key agg.
    "q136_balanced_shards" -> ((s, dir) => {
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      docs(s, dir).select(col("source"), col("doc_id"),
          size(toks(col("text"))).cast("long").as("nt"),
          (hash64(col("doc_id").cast("string"), ShardSeed) % 1000000L).as("h"))
        .withColumn("shard", ((row_number().over(w) - 1) % NumShards).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          countDistinct("source").as("n_sources"))
        .orderBy("shard")
    }),

    // Token-budget EPOCH PLAN (the LLaMA/Pile "epochs per source" table):
    // q133 samples DOWN (rate capped at 1); this plans the UP-sampling a
    // temperature mixture implies when the budget exceeds the corpus —
    // per-source target tokens = budget·√tokens/Σ√tokens, expressed as
    // whole epochs (integer repeats of the source) plus a fractional
    // remainder keep-rate for the final partial pass. The corpus collapses
    // to one ~20-row source dimension in a single map-side-combined agg;
    // everything after is broadcast-sized. Σ√tokens crosses rows as a
    // double, so it uses the q101 sorted fold; target_tokens is a floor of
    // deterministic IEEE ops (same operands ⇒ same value on both engines).
    "q141_epoch_plan" -> ((s, dir) => epochPlanOf(s, dir).orderBy("source")),

    // Sequence-length HISTOGRAM + padding-waste report — the trainer-side
    // metric that motivates q132's cross-doc packing: per (source,
    // log₂-length bucket): doc count, token mass, and the tokens a
    // pad-to-window loader (fixed ChunkLen windows, one doc per window
    // run) would BURN as padding vs the cross-doc pack's zero waste.
    // Strictly narrow per-doc arithmetic into one map-side-combined agg;
    // the histogram is ≤ sources × 64 rows at any corpus size.
    "q153_length_histogram" -> ((s, dir) => {
      val nt = size(toks(col("text"))).cast("long")
      docs(s, dir).select(col("source"), nt.as("nt"))
        // ⌊log₂ n⌋ via binary-string length — integer-exact on both
        // engines (adaptiveBandBits' rule: no float log2 whose boundary
        // rounding could diverge at exact powers of two)
        .withColumn("len_bucket",
          (length(bin(greatest(col("nt"), lit(1L)))) - 1).cast("long"))
        .withColumn("padded",
          expr(s"((nt + ${ChunkLen - 1}) div $ChunkLen) * $ChunkLen"))
        .groupBy("source", "len_bucket")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          sum(col("padded") - col("nt")).as("pad_tokens"))
        .withColumn("waste_frac", round(col("pad_tokens").cast("double") /
          (col("n_tokens") + col("pad_tokens")).cast("double"), 6))
        .orderBy("source", "len_bucket")
    }),

    // MIXTURE-TEMPERATURE SWEEP — the knob study you read BEFORE q141
    // fixes τ at 0.5: per-source corpus share and budget allocation at
    // τ ∈ {0.25, 0.5, 1.0} (τ→0 flattens toward uniform; τ = 1 is
    // proportional sampling — the LLaMA/Pile trade-off table).
    // Temperatures are sqrt-CHAINS (x^0.25 = √√x): every op is a
    // correctly-rounded IEEE primitive, so both engines produce
    // bit-identical weights — pow() is correctly rounded in NEITHER
    // engine and is banned by the house determinism rule. Scale shape:
    // the corpus collapses to the ~20-row source dim in one map-side-
    // combined agg; the whole sweep is arithmetic on that broadcast dim
    // (Σwt crosses rows as a double → the q101 sorted fold, per τ).
    "q157_mixture_temperature" -> ((s, dir) => {
      import s.implicits._
      val stats = docs(s, dir).select(col("source"),
          size(toks(col("text"))).cast("long").as("nt"))
        .groupBy("source").agg(sum("nt").as("n_tokens"))
      val sweep = stats
        .crossJoin(Seq(25L, 50L, 100L).toDF("tau_pct"))
        .withColumn("wt",
          when(col("tau_pct") === 25,
            sqrt(sqrt(col("n_tokens").cast("double"))))
            .when(col("tau_pct") === 50, sqrt(col("n_tokens").cast("double")))
            .otherwise(col("n_tokens").cast("double")))
      val tot = sweep.groupBy("tau_pct").agg(
        aggregate(sort_array(collect_list(struct(col("source"), col("wt")))),
          lit(0.0), (a, x) => a + x.getField("wt")).as("tot"))
      sweep.join(broadcast(tot), "tau_pct")
        .select(col("tau_pct"), col("source"), col("n_tokens"),
          round(col("wt") / col("tot"), 9).as("share"),
          floor(lit(EpochBudget) * col("wt") / col("tot")).cast("long")
            .as("target_tokens"))
        .orderBy("tau_pct", "source")
    }),

    // PAD-WASTE WINDOW SWEEP — q153 reports padding waste at the FIXED
    // ChunkLen; this sweeps the context-window size (the decision study:
    // how much token mass does a pad-to-window loader burn at 64/128/
    // 256/512, read BEFORE choosing the training sequence length and
    // whether cross-doc packing pays). All-integer per-doc arithmetic
    // (the q132 floorDiv rule — positive operands, so `div` is exact on
    // both engines) into one 4-key map-side-combined agg.
    "q165_pad_window_sweep" -> ((s, dir) => {
      import s.implicits._
      docs(s, dir).select(size(toks(col("text"))).cast("long").as("nt"))
        .crossJoin(Seq(64L, 128L, 256L, 512L).toDF("win"))
        .groupBy("win")
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
          sum(expr("((nt + win - 1) div win) * win - nt"))
            .as("pad_tokens"))
        .withColumn("waste_frac", round(col("pad_tokens").cast("double") /
          (col("n_tokens") + col("pad_tokens")).cast("double"), 6))
        .orderBy("win")
    }),

    // Epoch-plan EXECUTION — materialize q141's per-source plan as the
    // per-DOC copy-count manifest the data loader actually consumes:
    // every doc repeats n_epochs times plus one more iff its
    // deterministic md5 draw clears the remainder rate (q133's draw
    // convention, so the oracle replays it). The ~20-row plan broadcasts;
    // the corpus side is one scan + a broadcast join — nothing shuffles
    // but the presentation sort.
    "q149_epoch_expand" -> ((s, dir) =>
      expandCopies(
        docs(s, dir).select(col("source"), col("doc_id"),
          size(toks(col("text"))).cast("long").as("nt")),
        epochPlanOf(s, dir))
        .orderBy("doc_id")))

  /** q149's copy-count arithmetic over any (doc_id, source, nt) frame —
    * ONE definition shared with the streaming planned materializer
    * ([[graft.streaming.StreamingCorpusBuild]]), so the incremental plan
    * manifest can never diverge from the batch law: every doc repeats
    * n_epochs times plus one more iff its deterministic md5 draw clears
    * the remainder rate (q133's draw convention — the oracle replays it).
    * The ~20-row plan broadcasts; per-doc work is map-side arithmetic.
    */
  def expandCopies(d: DataFrame, plan: DataFrame): DataFrame =
    d.join(broadcast(plan.select("source", "n_epochs", "rem_rate")), "source")
      .withColumn("extra",
        (hash64(col("doc_id").cast("string"), ExpandSeed) % 1000000L <
          floor(col("rem_rate") * 1000000)).cast("long"))
      .select(col("doc_id"), col("source"), col("nt"),
        (col("n_epochs") + col("extra")).as("n_copies"))

  /** q141's plan (shared with q149's execution): per-source target
    * tokens = budget·√tokens/Σ√tokens as whole epochs + a fractional
    * remainder keep-rate.
    */
  private def epochPlanOf(s: SparkSession, dir: String): DataFrame = {
    val perDoc = docs(s, dir).select(col("source"),
      size(toks(col("text"))).cast("long").as("nt"))
    val stats = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
      .withColumn("sq", sqrt(col("n_tokens").cast("double")))
    val tot = broadcast(stats.agg(
      aggregate(sort_array(collect_list(struct(col("source"), col("sq")))),
        lit(0.0), (a, x) => a + x.getField("sq")).as("tot")))
    stats.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        floor(lit(EpochBudget) * col("sq") / col("tot")).cast("long")
          .as("target_tokens"))
      .withColumn("n_epochs", expr("target_tokens div n_tokens"))
      .withColumn("rem_rate",
        round((col("target_tokens") - col("n_epochs") * col("n_tokens"))
          .cast("double") / col("n_tokens").cast("double"), 9))
      .select("source", "n_docs", "n_tokens", "target_tokens",
        "n_epochs", "rem_rate")
  }

  /** q132's shard assignment — integer floorDiv, the SAME arithmetic as
    * StreamingPacking.assignBins' math.floorDiv (AssemblySpec pins the
    * agreement on boundary ids). A double floor loses exactness past 2^53;
    * here pmod keeps floor semantics for negative ids and `div` on the
    * exactly-divisible numerator is exact at any long.
    */
  def shardOf(idCol: String): org.apache.spark.sql.Column =
    expr(s"($idCol - pmod($idCol, ${PackShardDocs}L)) div ${PackShardDocs}L")

  /** The q131 chunk geometry over any (doc_id, tk, …extras) frame: every
    * row becomes ⌈(n−L)/S⌉+1 chunks of ≤ ChunkLen tokens starting every
    * ChunkStride (trailing chunk keeps the remainder). Extra columns pass
    * through untouched — CorpusBuild carries source/lang/split/shard
    * alongside the chunks. Strictly narrow: no exchange of any kind.
    */
  def chunkify(d: DataFrame): DataFrame = {
    val extras = d.columns.filter(c => c != "doc_id" && c != "tk").map(col)
    val nChunks = when(size(col("tk")) <= ChunkLen, lit(1L))
      .otherwise(ceil((size(col("tk")) - ChunkLen).cast("double") / ChunkStride) + 1)
    val start = (col("chunk_idx") * ChunkStride + 1).cast("int")
    d.select(col("doc_id") +: col("tk") +:
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx") +: extras: _*)
      .select(col("doc_id") +: col("chunk_idx") +:
        concat_ws(" ", slice(col("tk"), start, lit(ChunkLen))).as("chunk_text") +:
        size(slice(col("tk"), start, lit(ChunkLen))).cast("long").as("chunk_tokens") +:
        extras: _*)
  }

  val oracles: Map[String, String] = Map(

    "q131_context_chunks" ->
      raw"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
               FROM documents),
         c AS (SELECT doc_id, tk,
             CASE WHEN len(tk) <= $ChunkLen THEN 1
                  ELSE CAST(ceil(CAST(len(tk) - $ChunkLen AS DOUBLE) / $ChunkStride) AS BIGINT) + 1
             END AS nc
           FROM t),
         x AS (SELECT doc_id, tk, unnest(generate_series(0, nc - 1)) AS i FROM c)
         SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(tk, CAST(i*$ChunkStride+1 AS BIGINT),
             CAST(i*$ChunkStride+$ChunkLen AS BIGINT)), ' ') AS chunk_text,
           CAST(len(list_slice(tk, CAST(i*$ChunkStride+1 AS BIGINT),
             CAST(i*$ChunkStride+$ChunkLen AS BIGINT))) AS BIGINT) AS chunk_tokens
         FROM x ORDER BY doc_id, chunk_idx""",

    "q132_sequence_pack" ->
      raw"""WITH d AS (SELECT source, doc_id,
             CAST((doc_id - ((doc_id % $PackShardDocs + $PackShardDocs) % $PackShardDocs))
               // $PackShardDocs AS BIGINT) AS shard,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         c AS (SELECT source, shard, doc_id, nt,
             sum(nt) OVER (PARTITION BY source, shard ORDER BY doc_id) AS cum
           FROM d),
         b AS (SELECT source, shard, doc_id, nt,
             CAST(floor(CAST(cum - nt AS DOUBLE) / $PackBudget) AS BIGINT) AS bin_id,
             CAST(floor(CAST(cum - 1 AS DOUBLE) / $PackBudget) AS BIGINT) AS bin_end
           FROM c)
         SELECT source, shard, bin_id, count(*) AS n_docs, min(doc_id) AS first_doc,
           CAST(sum(CASE WHEN bin_end > bin_id THEN 1 ELSE 0 END) AS BIGINT) AS n_straddles,
           CAST(sum(nt) AS BIGINT) AS bin_doc_tokens
         FROM b GROUP BY source, shard, bin_id ORDER BY source, shard, bin_id""",

    "q133_mixture_rates" -> {
      val h = s"(${hash64Sql("CAST(doc_id AS VARCHAR)", MixSeed)}) % 1000000"
      raw"""WITH d AS (SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         st AS (SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
             sqrt(CAST(sum(nt) AS DOUBLE)) AS sq
           FROM d GROUP BY source),
         tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sq ORDER BY source)), (a, x) -> a + x) AS tot FROM st),
         r AS (SELECT source, n_docs, n_tokens,
             round(least(1.0, $MixBudget * sq / tot / CAST(n_tokens AS DOUBLE)), 9) AS rate
           FROM st CROSS JOIN tot)
         SELECT r.source, r.n_docs, r.n_tokens, r.rate,
           CAST(sum(CASE WHEN ($h) < floor(rate * 1000000) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN ($h) < floor(rate * 1000000) THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
         FROM r JOIN d ON r.source = d.source
         GROUP BY r.source, r.n_docs, r.n_tokens, r.rate ORDER BY r.source"""
    },

    "q134_domain_caps" -> {
      val h = s"(${hash64Sql("CAST(doc_id AS VARCHAR)", CapSeed)}) % 1000000"
      raw"""WITH d AS (SELECT source, lang, doc_id, ($h) AS h FROM documents),
         r AS (SELECT source, lang, doc_id,
             row_number() OVER (PARTITION BY source, lang ORDER BY h, doc_id) AS rn
           FROM d)
         SELECT source, lang, doc_id, CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= $DomainCap ORDER BY source, lang, rn"""
    },

    "q136_balanced_shards" -> {
      val h = s"(${hash64Sql("CAST(doc_id AS VARCHAR)", ShardSeed)}) % 1000000"
      raw"""WITH d AS (SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt,
             ($h) AS h
           FROM documents),
         r AS (SELECT source, doc_id, nt,
             CAST((row_number() OVER (PARTITION BY source ORDER BY h, doc_id) - 1)
               % $NumShards AS BIGINT) AS shard
           FROM d)
         SELECT shard, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
           count(DISTINCT source) AS n_sources
         FROM r GROUP BY shard ORDER BY shard"""
    },

    "q141_epoch_plan" ->
      raw"""WITH d AS (SELECT source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         st AS (SELECT source, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
             sqrt(CAST(sum(nt) AS DOUBLE)) AS sq
           FROM d GROUP BY source),
         tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sq ORDER BY source)), (a, x) -> a + x) AS tot FROM st),
         t AS (SELECT source, n_docs, n_tokens,
             CAST(floor($EpochBudget * sq / tot) AS BIGINT) AS target_tokens
           FROM st CROSS JOIN tot)
         SELECT source, n_docs, n_tokens, target_tokens,
           CAST(target_tokens // n_tokens AS BIGINT) AS n_epochs,
           round(CAST(target_tokens - (target_tokens // n_tokens) * n_tokens AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), 9) AS rem_rate
         FROM t ORDER BY source""",

    "q165_pad_window_sweep" ->
      raw"""WITH d AS (SELECT CAST(len(string_split_regex(trim(text), '\s+'))
               AS BIGINT) AS nt FROM documents),
         w AS (SELECT unnest([CAST(64 AS BIGINT), CAST(128 AS BIGINT),
             CAST(256 AS BIGINT), CAST(512 AS BIGINT)]) AS win)
         SELECT win, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(((nt + win - 1) // win) * win - nt) AS BIGINT)
             AS pad_tokens,
           round(CAST(sum(((nt + win - 1) // win) * win - nt)
               AS DOUBLE)
             / (sum(nt) + sum(((nt + win - 1) // win) * win - nt)),
             6) AS waste_frac
         FROM d CROSS JOIN w GROUP BY win ORDER BY win""",

    "q157_mixture_temperature" ->
      raw"""WITH d AS (SELECT source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         st AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens
           FROM d GROUP BY source),
         sw AS (SELECT tau_pct, source, n_tokens,
             CASE WHEN tau_pct = 25 THEN sqrt(sqrt(CAST(n_tokens AS DOUBLE)))
                  WHEN tau_pct = 50 THEN sqrt(CAST(n_tokens AS DOUBLE))
                  ELSE CAST(n_tokens AS DOUBLE) END AS wt
           FROM st CROSS JOIN (SELECT unnest([CAST(25 AS BIGINT),
             CAST(50 AS BIGINT), CAST(100 AS BIGINT)]) AS tau_pct)),
         tot AS (SELECT tau_pct, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(wt ORDER BY source)), (a, x) -> a + x) AS tot
           FROM sw GROUP BY tau_pct)
         SELECT sw.tau_pct AS tau_pct, source, n_tokens,
           round(wt / tot, 9) AS share,
           CAST(floor($EpochBudget * wt / tot) AS BIGINT) AS target_tokens
         FROM sw JOIN tot ON sw.tau_pct = tot.tau_pct
         ORDER BY sw.tau_pct, source""",

    "q149_epoch_expand" -> {
      val h = s"(${hash64Sql("CAST(d.doc_id AS VARCHAR)", ExpandSeed)}) % 1000000"
      raw"""WITH d AS (SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         st AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens,
             sqrt(CAST(sum(nt) AS DOUBLE)) AS sq
           FROM d GROUP BY source),
         tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(sq ORDER BY source)), (a, x) -> a + x) AS tot FROM st),
         p AS (SELECT source, n_tokens,
             CAST(floor($EpochBudget * sq / tot) AS BIGINT) AS target_tokens
           FROM st CROSS JOIN tot),
         r AS (SELECT source,
             CAST(target_tokens // n_tokens AS BIGINT) AS n_epochs,
             round(CAST(target_tokens - (target_tokens // n_tokens) * n_tokens AS DOUBLE)
               / CAST(n_tokens AS DOUBLE), 9) AS rem_rate
           FROM p)
         SELECT d.doc_id, d.source, d.nt,
           CAST(n_epochs + (CASE WHEN ($h) < floor(rem_rate * 1000000)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
         FROM d JOIN r ON r.source = d.source
         ORDER BY d.doc_id"""
    },

    "q153_length_histogram" ->
      raw"""WITH d AS (SELECT source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt
           FROM documents),
         b AS (SELECT source, nt,
             CAST(length(bin(greatest(nt, 1))) - 1 AS BIGINT) AS len_bucket,
             ((nt + ${ChunkLen - 1}) // $ChunkLen) * $ChunkLen AS padded
           FROM d)
         SELECT source, len_bucket, count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(padded - nt) AS BIGINT) AS pad_tokens,
           round(CAST(sum(padded - nt) AS DOUBLE)
             / (CAST(sum(nt) AS DOUBLE) + CAST(sum(padded - nt) AS DOUBLE)),
             6) AS waste_frac
         FROM b GROUP BY source, len_bucket ORDER BY source, len_bucket""")
}
