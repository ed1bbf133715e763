package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark has no native verb for — as-of join, interval
  * (range) join, cohort retention — plus two training-data pipeline stages
  * (domain mixture weighting, context-window chunking). The first two are
  * the operator classes the round-1 review listed as "operators the engine
  * may need that Spark lacks"; both are built here by composing existing
  * operators (option (a) of the preference order) into shapes that stay
  * keyed-shuffle-only at 100 TB:
  *
  *  - as-of join: union + tag + partitioned running `last(ignoreNulls)`
  *    window — ONE shuffle on the join key, zero row blow-up, no range
  *    condition ever reaches the planner (a naive `a.ts <= b.ts` join is a
  *    BroadcastNestedLoop). This is how kdb/Flink-style as-of semantics map
  *    onto a shuffle engine.
  *  - range join: time-bucket blocking sized so every interval spans ≤ 2
  *    buckets — candidates come from an equi-join on (key, bucket), the
  *    exact containment predicate filters inside the bucket. Candidate
  *    volume is O(events · 2), never O(n²).
  *
  * All timestamp arithmetic is exact integer micros (`unix_micros` ↔
  * DuckDB `epoch_us`) — no calendar functions whose week/era conventions
  * could diverge between engines.
  */
object TemporalQueries extends QueryModule {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Range-join window length (seconds). Bucket width == window length, so
    * an interval overlaps at most 2 buckets — the blocking invariant.
    */
  private val RangeWindowS = 600L
  private val RangeWindowUs = RangeWindowS * 1000000L

  private val WeekUs = 7L * 86400L * 1000000L

  /** q115 session cut: an idle gap strictly longer than 30 min starts a new
    * session (the common web-analytics convention).
    */
  private val SessionGapUs = 30L * 60L * 1000000L

  /** Mixture temperature (UniMax/mT5-style domain balancing). */
  private val MixtureAlpha = 0.7

  private val ChunkSize = 64
  private val ChunkStride = 48

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // AS-OF JOIN: each purchase matched to the user's latest click at or
    // before it. Right side deduped to one row per (user, ts) (max event_id)
    // — the only ordering ambiguity as-of semantics leave open. Union both
    // sides with a side tag (click sorts before a same-instant purchase, so
    // "at or before" includes ties), then a running last(ignoreNulls) per
    // user carries the most recent click forward. One shuffle on user_id;
    // scales to any corpus because no per-row range scan exists.
    "q83_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
        .groupBy("user_id", "ts").agg(max("event_id").as("c_event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("p_event_id"))
      val tagged = clicks
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("c_event_id"), lit(null).cast("long").as("p_event_id"))
        .unionByName(purchases.select(col("user_id"), col("ts"),
          lit(1).as("side"), lit(null).cast("long").as("c_event_id"),
          col("p_event_id")))
      val w = Window.partitionBy("user_id").orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // both carried values in ONE select so CollapseWindow merges them
      // into a single Window pass (sequential withColumn leaves two)
      tagged
        .select(col("*"),
          last(col("c_event_id"), ignoreNulls = true).over(w).as("m_id"),
          last(when(col("side") === 0, unix_micros(col("ts"))),
            ignoreNulls = true).over(w).as("m_us"))
        .filter(col("side") === 1)
        .select(col("p_event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"),
          col("m_id").as("c_event_id"), col("m_us").as("c_us"),
          (unix_micros(col("ts")) - col("m_us")).as("gap_us"))
        .orderBy("p_event_id")
    }),

    // RANGE JOIN: every error event opens a [ts, ts+10min) window; count the
    // same user's clicks inside it. Blocking: bucket = µs div window-length,
    // each window explodes into its ≤ 2 buckets, candidates come from the
    // (user, bucket) equi-join, exact containment filters after. Errors with
    // no clicks survive via the left join of counts back onto the windows.
    "q84_range_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val errs = e.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id"),
          unix_micros(col("ts")).as("e_us"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
          col("event_id").as("c_id"))
        .withColumn("bucket", floor(col("c_us") / RangeWindowUs))
      val counts = errs
        .withColumn("b0", floor(col("e_us") / RangeWindowUs))
        .withColumn("bucket", explode(array(col("b0"), col("b0") + 1)))
        .join(clicks, Seq("user_id", "bucket"))
        .filter(col("c_us") >= col("e_us") &&
          col("c_us") < col("e_us") + RangeWindowUs)
        .groupBy("e_id").agg(count(lit(1)).as("n_clicks"))
      errs.join(counts, Seq("e_id"), "left")
        .select(col("e_id"), col("user_id"), col("e_us"),
          coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy("e_id")
    }),

    // COHORT RETENTION: users bucketed by the week of their first event;
    // per (cohort, week offset since first event): active users, events,
    // cohort size, retention rate. Exact integer week arithmetic — no
    // calendar truncation. Two keyed aggregations, one broadcast-size dim
    // (cohort sizes); the event scan dominates, as it should.
    "q85_funnel_cohorts" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), unix_micros(col("ts")).as("us"))
      val first = e.groupBy("user_id").agg(min("us").as("first_us"))
        .withColumn("cohort_week", floor(col("first_us") / WeekUs))
      val sizes = first.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_size"))
      e.join(first, "user_id")
        .withColumn("offset_weeks",
          floor((col("us") - col("first_us")) / WeekUs))
        .groupBy("cohort_week", "offset_weeks")
        .agg(countDistinct("user_id").as("active_users"),
          count(lit(1)).as("n_events"))
        .join(broadcast(sizes), "cohort_week")
        .withColumn("retention",
          round(col("active_users").cast("double") / col("cohort_size"), 4))
        .select("cohort_week", "offset_weeks", "active_users", "n_events",
          "cohort_size", "retention")
        .orderBy("cohort_week", "offset_weeks")
    }),

    // DOMAIN MIXTURE WEIGHTS: temperature-α sampling weights per
    // (lang, source) domain — w_d ∝ n_d^α, renormalized; `upsampling` is the
    // factor vs proportional sampling (the number a data loader multiplies
    // each domain's epoch count by). The corpus collapses to one tiny
    // domain table before any math, so this costs one aggregation at any
    // corpus size.
    "q86_mixture_weights" -> ((s, dir) => {
      val dom = docs(s, dir).groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
        .withColumn("w_raw", pow(col("n_docs").cast("double"), MixtureAlpha))
      val tot = dom.agg(sum("w_raw").as("w_tot"),
        sum("n_docs").as("n_tot"))
      dom.crossJoin(broadcast(tot))
        .withColumn("weight", round(col("w_raw") / col("w_tot"), 4))
        .withColumn("upsampling",
          round((col("w_raw") / col("w_tot")) /
            (col("n_docs").cast("double") / col("n_tot")), 4))
        .select("lang", "source", "n_docs", "n_chars", "weight", "upsampling")
        .orderBy("lang", "source")
    }),

    // CONTEXT-WINDOW CHUNKING: split each doc's token stream into
    // overlapping windows (size 64, stride 48) — the packing-adjacent stage
    // that turns documents into training sequences. Pure per-row explode
    // (no shuffle before the final sort); chunk count and spans derived in
    // exact integer arithmetic. Empty docs excluded on both sides (same
    // convention as q44 — split-on-empty diverges between engines).
    "q87_doc_chunking" -> ((s, dir) => {
      docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .withColumn("n_tok", size(col("t")).cast("long"))
        .withColumn("n_chunks",
          when(col("n_tok") <= ChunkSize, lit(1L))
            .otherwise(floor((col("n_tok") - ChunkSize + ChunkStride - 1)
              / ChunkStride) + 1))
        .withColumn("chunk", explode(sequence(lit(0L), col("n_chunks") - 1)))
        .withColumn("start_tok", col("chunk") * ChunkStride)
        .withColumn("chunk_len",
          least(lit(ChunkSize.toLong), col("n_tok") - col("start_tok")))
        .select(col("doc_id"), col("chunk"), col("start_tok"), col("chunk_len"),
          element_at(col("t"), (col("start_tok") + 1).cast("int")).as("first_tok"))
        .orderBy("doc_id", "chunk")
    }),

    // GAP SESSIONIZATION: per-user sessions cut where the idle gap exceeds
    // 30 minutes — the classic event-stream operator Spark SQL has no batch
    // verb for (streaming has session_window; this is its exact batch
    // construction). Boundary flags from a per-user lag, session ordinal as
    // the running sum of boundaries, then one roll-up. Both windows and the
    // roll-up share the user_id hash partitioning (the grouping key set
    // contains the window key), so the WHOLE operator is ONE shuffle —
    // EnsureRequirements inserts no second exchange for the groupBy. Value
    // sums in exact e4 fixed-point so engine summation order can't smear
    // low bits. Ties inside a user's stream break by event_id, making lag
    // and the session ordinal deterministic.
    "q115_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val e = ev(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("us"),
        round(col("value") * 10000).cast("long").as("v4"))
      e.withColumn("prev_us", lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
        .withColumn("session_ord",
          sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_ord")
        .agg(min("us").as("start_us"), max("us").as("end_us"),
          count(lit(1)).as("n_events"), sum("v4").as("value_e4"),
          countDistinct("event_type").as("n_types"))
        .orderBy("user_id", "session_ord")
    })
  )

  val oracles: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN re-derives the match — the Spark union+
    // window construction is verified against the engine primitive itself.
    "q83_asof_join" ->
      """WITH clicks AS (
           SELECT user_id, ts, max(event_id) AS c_event_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         p AS (
           SELECT event_id AS p_event_id, user_id, ts
           FROM events WHERE event_type = 'purchase')
         SELECT p.p_event_id, p.user_id, epoch_us(p.ts) AS p_us,
           c.c_event_id, epoch_us(c.ts) AS c_us,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         FROM p ASOF LEFT JOIN clicks c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p_event_id""",
    "q84_range_join" ->
      s"""WITH e AS (SELECT event_id AS e_id, user_id, epoch_us(ts) AS e_us
                     FROM events WHERE event_type = 'error'),
          c AS (SELECT user_id, epoch_us(ts) AS c_us
                FROM events WHERE event_type = 'click')
          SELECT e.e_id, e.user_id, e.e_us,
            (SELECT count(*) FROM c
             WHERE c.user_id = e.user_id AND c.c_us >= e.e_us
               AND c.c_us < e.e_us + $RangeWindowUs) AS n_clicks
          FROM e ORDER BY e_id""",
    "q85_funnel_cohorts" ->
      s"""WITH ue AS (SELECT user_id, epoch_us(ts) AS us FROM events),
          first AS (SELECT user_id, min(us) AS first_us,
                      min(us) // $WeekUs AS cohort_week
                    FROM ue GROUP BY user_id),
          sizes AS (SELECT cohort_week, count(*) AS cohort_size
                    FROM first GROUP BY 1),
          act AS (SELECT f.cohort_week,
                    (ue.us - f.first_us) // $WeekUs AS offset_weeks,
                    count(DISTINCT ue.user_id) AS active_users,
                    count(*) AS n_events
                  FROM ue JOIN first f USING (user_id)
                  GROUP BY 1, 2)
          SELECT a.cohort_week, a.offset_weeks, a.active_users, a.n_events,
            s.cohort_size,
            round(CAST(a.active_users AS DOUBLE) / s.cohort_size, 4) AS retention
          FROM act a JOIN sizes s USING (cohort_week)
          ORDER BY cohort_week, offset_weeks""",
    "q86_mixture_weights" ->
      s"""WITH dom AS (
            SELECT lang, source, count(*) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS n_chars,
              pow(count(*), $MixtureAlpha) AS w_raw
            FROM documents GROUP BY 1, 2),
          tot AS (SELECT sum(w_raw) AS w_tot, sum(n_docs) AS n_tot FROM dom)
          SELECT lang, source, n_docs, n_chars,
            round(w_raw / w_tot, 4) AS weight,
            round((w_raw / w_tot) / (CAST(n_docs AS DOUBLE) / n_tot), 4)
              AS upsampling
          FROM dom, tot ORDER BY lang, source""",
    "q87_doc_chunking" ->
      s"""WITH tk AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
            FROM documents WHERE length(trim(text)) > 0),
          d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tok FROM tk),
          n AS (SELECT doc_id, t, n_tok,
                  CASE WHEN n_tok <= $ChunkSize THEN 1
                       ELSE (n_tok - $ChunkSize + ${ChunkStride - 1})
                            // $ChunkStride + 1 END AS n_chunks
                FROM d),
          ch AS (SELECT doc_id, t, n_tok,
                   unnest(range(0, n_chunks)) AS chunk
                 FROM n)
          SELECT doc_id, chunk, chunk * $ChunkStride AS start_tok,
            least($ChunkSize, n_tok - chunk * $ChunkStride) AS chunk_len,
            t[CAST(chunk * $ChunkStride + 1 AS INTEGER)] AS first_tok
          FROM ch ORDER BY doc_id, chunk""",
    "q115_sessionize" ->
      s"""WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
              CAST(round(value * 10000) AS BIGINT) AS v4
            FROM events),
          b AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                    OR us - lag(us) OVER w > $SessionGapUs
                  THEN 1 ELSE 0 END AS new_sess
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
          sess AS (SELECT *, sum(new_sess) OVER (
                     PARTITION BY user_id ORDER BY us, event_id
                     ROWS UNBOUNDED PRECEDING) AS session_ord
                   FROM b)
          SELECT user_id, CAST(session_ord AS BIGINT) AS session_ord,
            min(us) AS start_us, max(us) AS end_us,
            count(*) AS n_events, CAST(sum(v4) AS BIGINT) AS value_e4,
            CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
          FROM sess GROUP BY user_id, session_ord
          ORDER BY user_id, session_ord"""
  )
}
