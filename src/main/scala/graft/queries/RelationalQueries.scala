package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators from SURVEY.md §2 (joins J1–J8, aggregations
  * A1–A11, sorts/limits O1–O5, set ops E1–E4), expressed over the harness's
  * TPC-H-ish tables so the driver's DuckDB oracle can check them.
  *
  * Domain versions of the same shapes (UTXO anti-join, cumulative chain
  * stats, top-K addresses …) live in `graft.chain` and are tested against
  * block fixtures; these are the scale-checked generic forms.
  *
  * Scale notes (100 TB design): every query here keeps filters/projections
  * adjacent to the scan (pushdown), broadcasts only the genuinely small dims
  * (nation/region), and uses `orderBy+limit` (TakeOrderedAndProject — no full
  * sort) for top-K. Double aggregates are rounded to 2 decimals on both sides
  * so summation-order ulp noise cannot flip the driver's hash compare.
  */
object RelationalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: per-group sums/counts (per-block sums analog,
    // reference BlockBuilder.scala:19-26).
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J1: 3-way equi join fact ⋈ dim ⋈ dim (Box ⋈ ErgoTree ⋈ Block analog,
    // reference PersistentBoxRepo.scala:72-86). nation is broadcast-small.
    "q2_join3" -> ((s, dir) => {
      val customer = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val nation = t(s, dir, "nation")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum("o_totalprice"), 2).as("revenue"),
          countDistinct("c_custkey").as("n_cust"))
        .orderBy("n_name")
    }),

    // J2: left outer join + per-key count histogram (Box ⟕ Asset2Box analog,
    // reference PersistentAssetRepo.scala:18-166).
    "q3_left_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders").select("o_orderkey")
      val lineitem = t(s, dir, "lineitem").select("l_orderkey")
      // aggregate BELOW the join (optimization r18; guide §2.3 "aggregate
      // before you shuffle"): o_orderkey is unique in orders, so
      // count-per-key over lineitem FIRST collapses the fact side to one
      // row per key map-side — the join then moves per-key counts, never
      // the lineitem row mass, and unmatched orders take n_items = 0
      // exactly as count(l_orderkey) over the old left join did.
      val perKey = lineitem.groupBy("l_orderkey")
        .agg(count(lit(1)).as("cnt"))
      orders
        .join(perKey, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(coalesce(col("cnt"), lit(0L)).as("n_items"))
        .groupBy("n_items")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("n_items")
    }),

    // J3: left-semi join (utxo ids holding a token analog,
    // reference PersistentBoxRepo.lookupUtxoIdsByTokenId:115-129).
    "q4_semi_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
      t(s, dir, "customer")
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // J5/E1: anti join — the UTXO trick: unspent = outputs ∖ inputs
    // (reference BoxService.scala:132-138, MvStorage.removeInputBoxes*).
    "q5_anti_join" -> ((s, dir) => {
      val orders = t(s, dir, "orders").select("o_custkey")
      t(s, dir, "customer")
        .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // A3: cumulative running totals over an ordered dimension (cumulative
    // chain stats analog, reference BlockBuilder.scala:23-66). Daily revenue
    // is rounded first so the sequential cumsum is bit-identical across
    // engines; the running sum itself is an ordered-window prefix sum. The
    // window input is the per-day aggregate (bounded by the calendar, not
    // the fact table), so the single-partition prefix sum stays tiny at any
    // corpus scale; unbounded-key cumulative sums use the two-phase scheme
    // in BlockDerivation (A3/A5).
    "q6_running_total" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(round(sum("o_totalprice"), 2).as("day_rev"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("cum_rev", round(sum("day_rev").over(w), 2))
        .orderBy("day")
    }),

    // A5: global monotonic index, limit-first (globalIndex analog, reference
    // BlockBuilder.scala:27-32, FullBlockBuilder.scala:66-87). The top-100
    // rows are selected with orderBy+limit (TakeOrderedAndProject — fully
    // distributed), and only the surviving 100 rows pass through the global
    // row_number window — result-identical to numbering the whole table
    // first, without funnelling it through one partition. (For a full-table
    // global index, use the two-phase base+position scheme the chain
    // derivation uses — BlockDerivation A5.)
    "q7_global_index" -> ((s, dir) => {
      val w = Window.orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
        .withColumn("gix", row_number().over(w).cast("long") - 1)
        .select("o_orderkey", "gix")
    }),

    // A6: top-K keys by count (top addresses by UTXO count analog,
    // reference StatsService.scala:12-22). orderBy+limit plans as
    // TakeOrderedAndProject — no global sort at scale.
    "q8_topk_count" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(desc("n_orders"), asc("o_custkey"))
        .limit(20)
    }),

    // A7: top-K keys by summed value (top addresses by value analog,
    // reference StatsService.scala:24-35).
    "q9_topk_sum" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("total_spend"))
        .orderBy(desc("total_spend"), asc("o_custkey"))
        .limit(20)
    }),

    // O1: last-N by ordered key desc (last-N blocks analog,
    // reference PersistentBlockRepo.getLastBlocks:32-41).
    "q10_last_n" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
        .limit(20)
    }),

    // O4/E3: gap detection — generated range ∖ existing keys (missing
    // heights analog, reference MvStorage.findMissingHeights:284-290).
    "q11_gaps" -> ((s, dir) => {
      val existing = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      s.range(1, 201).select(col("id").as("k"))
        .join(existing, Seq("k"), "left_anti")
        .orderBy("k")
    }),

    // E1: set difference on a single key column (spent ids analog,
    // reference BoxService.scala:92,138).
    "q12_except" -> ((s, dir) => {
      val active = t(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val negative = t(s, dir, "customer")
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      active.except(negative).orderBy("custkey")
    }),

    // E4: union of heterogeneous entity projections (per-block entity write
    // fan-in analog, reference PersistentRepo.writeBlock:47-53).
    "q13_union" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .select(lit("supplier").as("kind"), col("s_suppkey").as("key"),
          round(col("s_acctbal"), 2).as("acctbal"))
      val cust = t(s, dir, "customer")
        .select(lit("customer").as("kind"), col("c_custkey").as("key"),
          round(col("c_acctbal"), 2).as("acctbal"))
      sup.unionByName(cust).orderBy("kind", "key")
    }),

    // A3/J4: lag over partitioned order — parent-link / blockMiningTime
    // analog (reference BlockBuilder.scala:43-44: timestamp − parent's).
    "q14_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("prev_date", lag("o_orderdate", 1).over(w))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), col("prev_date")).as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // A2/P3: conditional aggregation (block-fee sum analog,
    // reference RewardCalculator.scala:45-49).
    "q15_conditional_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(sum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(0.0)), 2).as("urgent_rev"),
          round(sum(when(col("o_orderpriority") =!= "1-URGENT", col("o_totalprice")).otherwise(0.0)), 2).as("other_rev"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // distinct aggregation (non-empty address count analog,
    // reference readme.md:174-183 epoch roll-up counters).
    "q16_distinct" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(countDistinct("c_nationkey").as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // P2: last-element-per-group via descending row_number (coinbase = last
    // tx of block, reference FullBlockBuilder.scala:86-87). (l_orderkey,
    // l_linenumber) is NOT unique in the synthetic data, so l_quantity
    // tie-breaks to make the projected columns deterministic.
    "q17_last_per_group" -> ((s, dir) => {
      // max(struct) instead of a row_number window (optimization r18;
      // guide §2.3): the window form shuffles and SORTS every lineitem row
      // per group; max over struct(l_linenumber, l_quantity) — the same
      // lexicographic (desc, desc) pick — runs as a hash aggregate with
      // map-side partial maxes, so the exchange carries one row per key.
      // Ties beyond (l_linenumber, l_quantity) are value-identical: only
      // those two columns are projected.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          struct(col("l_linenumber"), col("l_quantity")).as("lr"))
        .groupBy("l_orderkey")
        .agg(max("lr").as("top"))
        .select(col("l_orderkey"), col("top.l_linenumber").as("last_line"),
          round(col("top.l_quantity"), 2).as("qty"))
        .orderBy("l_orderkey")
    }),

    // Event-time tumbling aggregation, batch form of the streaming window
    // (SURVEY §2.9 — the engine exposes event-time windows beyond parity).
    "q18_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // P11: JSON field extraction (register map pivot analog,
    // reference OutputBuilder.scala:63-68 / NodeModel extension fields).
    "q19_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k")
    }),

    // J6: fact-to-state enrichment join (input boxId → utxo value analog,
    // reference MvStorage.removeInputBoxesByErgoTree:132-147): every event
    // enriched with its user's order stats.
    "q20_enrich_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .join(cust, col("user_id") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_purchases"), round(sum("value"), 2).as("sum_value"))
        .orderBy("c_nationkey")
    }),

    // Beyond-parity (SURVEY §2.5 note): hierarchical subtotal roll-up —
    // the reference's epoch roll-ups generalized to grouping sets.
    "q45_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    }),

    // Post-aggregation predicate (HAVING) — repeat-customer detection.
    "q46_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
        .filter(col("n_orders") >= 8)
        .orderBy("o_custkey")
    }),

    // Ranking window functions (rank/dense_rank) within partitions.
    "q47_rank_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus").orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 5)
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"), col("rnk"), col("drnk"))
        .orderBy("o_orderstatus", "rnk", "o_orderkey")
    }),

    // RANGE-frame window: trailing-7-day revenue per day (value-based frame,
    // not row count — the moving-aggregate shape the reference lacks). Like
    // q6, the window runs over the calendar-bounded per-day aggregate, so
    // the unpartitioned frame never sees fact-table cardinality.
    "q48_range_window" -> ((s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("dnum"))
        .agg(round(sum("o_totalprice"), 2).as("day_rev"))
      val w = Window.orderBy("dnum").rangeBetween(-6, 0)
      daily
        .withColumn("trailing7_rev", round(sum("day_rev").over(w), 2))
        .orderBy("dnum")
    }),

    // HLL cardinality (approx_count_distinct) — the datasketches TODO the
    // reference never built (readme.md:226).
    // HLL++ sketch vs exact cardinality. HLL register merges are max()
    // (commutative/associative), so the approx value is deterministic for a
    // given dataset regardless of partitioning — but not portable to
    // DuckDB's different sketch. The hash-comparable contract is therefore:
    // exact counts (both engines) + a within-5×rsd relative-error flag that
    // the oracle asserts as literal TRUE — Spark's sketch drifting out of
    // tolerance turns the row red. (Default 5% rsd misses ~1.4k-key groups
    // by >2%, so the sketch is tightened to rsd=1% — 2^14 registers, the
    // supernode-cardinality trade the reference's datasketches TODO is
    // about.)
    "q49_approx_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey"), 0.01).as("approx"),
          countDistinct("o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
        .select(col("o_orderstatus"), col("n_custs"), col("n_orders"),
          (abs(col("approx") - col("n_custs")).cast("double") <=
            lit(0.05) * col("n_custs").cast("double")).as("within_5pct"))
        .orderBy("o_orderstatus")
    }),

    // Approximate percentiles (Greenwald–Khanna sketch, accuracy 100) vs
    // the exact quantile, same error-bound-as-oracle contract as q49: the
    // oracle recomputes the exact values and asserts the sketch landed
    // within 2% of them — completes the mergeable-sketch family
    // (HLL q49, Misra–Gries q81, quantile sketch here). At 100 TB the
    // sketch is THE percentile path: mergeable partials, no global sort.
    "q90_approx_percentile" -> ((s, dir) => {
      val exact = expr("percentile(o_totalprice, array(0.5, 0.99))")
      val approx = expr("approx_percentile(o_totalprice, array(0.5, 0.99), 100)")
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(exact.getItem(0), 2).as("p50"),
          round(exact.getItem(1), 2).as("p99"),
          approx.getItem(0).as("a50"), approx.getItem(1).as("a99"))
        .select(col("o_orderstatus"), col("p50"), col("p99"),
          (abs(col("a50") - col("p50")) <= lit(0.02) * col("p50")).as("p50_within_2pct"),
          (abs(col("a99") - col("p99")) <= lit(0.02) * col("p99")).as("p99_within_2pct"))
        .orderBy("o_orderstatus")
    }),

    // Fact ⋈ part-dim aggregation (completes the star-schema coverage).
    "q52_part_join" -> ((s, dir) => {
      val part = t(s, dir, "part").select("p_partkey", "p_brand")
      t(s, dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_quantity")
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("revenue"),
          round(avg("l_quantity"), 2).as("avg_qty"))
        .orderBy("p_brand")
    }),

    // Batch sessionization (islands and gaps): an event starts a new session
    // when > 30 min from the user's previous event; session id = running sum
    // of the start flags. The batch twin of the streaming session_window.
    "q54_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sessions = t(s, dir, "events")
        .select("user_id", "event_id", "ts")
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(w))
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("session_id",
          sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          max("n_events").as("max_session_events"))
        .filter(col("n_sessions") >= 3)
        .orderBy("user_id")
    }),

    // Exact interpolated percentiles (Spark `percentile` ↔ DuckDB
    // quantile_cont — both linear interpolation over the sorted set).
    "q55_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // Pivot (wide aggregation): revenue per priority × status matrix, with
    // explicit pivot values so the output schema is static.
    "q56_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("o_orderpriority")
    }),

    // Scalar string-function surface: upper/substr/replace/length/concat —
    // pure per-row projection, no shuffle until the presentation sort.
    "q57_string_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .filter(col("c_custkey") <= 100)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          regexp_replace(col("c_name"), "0", "#").as("masked"),
          concat_ws("|", col("c_mktsegment"), col("c_nationkey")).as("seg_key"))
        .orderBy("c_custkey")
    }),

    // Ordered array aggregation fingerprint: per-nation sorted member list
    // digest (collect_list is unordered by contract — sorting restores
    // determinism before hashing).
    "q58_array_fingerprint" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy("c_nationkey")
        .agg(
          count(lit(1)).as("n"),
          md5(concat_ws(",", array_sort(collect_list(col("c_name"))))).as("members_fp"))
        .orderBy("c_nationkey")
    }),

    // Column profiling / ANALYZE-stats collection (the stats surface every
    // warehouse engine maintains for its optimizer — row counts, null
    // counts, NDV, min/max/avg per column): ONE corpus pass computing all
    // per-column aggregates side by side, then an in-row unpivot to the
    // (column_name, stats) presentation shape — no per-column rescans.
    // NDV here is exact countDistinct (planned as a single Expand);
    // at 100 TB the same query swaps in approx_count_distinct — the
    // error-bound contract for that sketch is q49's.
    "q105_column_profile" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        round(min(col(c)), 4).as(s"min_$c"),
        round(max(col(c)), 4).as(s"max_$c"),
        round(avg(col(c)), 4).as(s"avg_$c")))
      val profiled = t(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
      val rows = cols.map(c => struct(
        lit(c).as("column_name"), col("n_rows"),
        col(s"nn_$c").as("n_nonnull"), col(s"ndv_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v"),
        col(s"avg_$c").as("avg_v")))
      profiled.select(explode(array(rows: _*)).as("r"))
        .select("r.*")
        .orderBy("column_name")
    }),

    // Snowflake chain region ⋈ nation ⋈ customer (the full dim hierarchy).
    "q53_region_rollup" -> ((s, dir) => {
      t(s, dir, "customer").select("c_nationkey", "c_acctbal")
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").select("r_regionkey", "r_name")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("r_name", "n_name")
    }),

    // Z-ORDER data layout audit — the write-side clustering key that makes
    // MULTI-dimension predicate pruning work at 100 TB: quantize two scan
    // dimensions to 16 bits each, interleave the bits (Morton code), and
    // report per z-prefix-bucket min/max spans of BOTH dimensions. Under a
    // 1-D sort the secondary dimension's per-file span is the full range
    // (no file ever prunes on it); under the z-order each of the 64
    // buckets covers ~1/8 of EACH dimension's range, so parquet min/max
    // file stats prune selective predicates on either column. The bucket
    // key is a bit prefix of the z-value — no rank, no global sort: at
    // scale the physical write is repartitionByRange(zv) +
    // sortWithinPartitions(zv), and this audit is one scan + a map-side
    // 64-key agg (the min/max table below IS what the pruning would read).
    // All bit math is integer and identical on both engines.
    "q144_zorder_layout" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
      // the 4-value range frame folds as LITERALS (the q128 pattern): a
      // bounded 1-row collect, so the audit itself is ONE scan with zero
      // joins — at scale the ranges come from the table's own column
      // stats, not a data pass at all
      val st = li.agg(
        min(col("l_partkey").cast("long")), max(col("l_partkey").cast("long")),
        min(col("l_suppkey").cast("long")), max(col("l_suppkey").cast("long")))
        .head()
      val (pmin, pmax, smin, smax) =
        (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      val pRng = math.max(1L, pmax - pmin)
      val sRng = math.max(1L, smax - smin)
      // same int64-overflow guard as Compaction.compactZOrdered: a range
      // past ~1.4e14 makes (dim − min) * 65535 wrap and the audit would
      // report a garbage layout as if it were real
      require(pRng <= Long.MaxValue / 65535 && sRng <= Long.MaxValue / 65535,
        s"q144: dimension range too wide for 16-bit quantization " +
          s"(pRng=$pRng, sRng=$sRng) — pre-bucket before z-ordering")
      li
        .withColumn("qx", expr(s"((l_partkey - ${pmin}L) * 65535) div ${pRng}L"))
        .withColumn("qy", expr(s"((l_suppkey - ${smin}L) * 65535) div ${sRng}L"))
        .withColumn("file_id",
          expr(s"(${zInterleaveSpark("qx", "qy")}) div ${1L << ZFileShift}"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
          min("l_suppkey").as("sk_min"), max("l_suppkey").as("sk_max"))
        .select(col("file_id"), col("n_rows"),
          col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
          round((col("pk_max") - col("pk_min")).cast("double") / pRng, 6)
            .as("pk_span_frac"),
          round((col("sk_max") - col("sk_min")).cast("double") / sRng, 6)
            .as("sk_span_frac"))
        .orderBy("file_id")
    })
  )

  /** q144's z-prefix bucket width: drop the low 26 of the 32 interleaved
    * bits — 2⁶ = 64 buckets, 3 leading bits per dimension.
    */
  private val ZFileShift = 26

  /** 16-bit × 16-bit Morton interleave, rendered once per dialect from the
    * same term list so the engines cannot diverge bit-by-bit. The Spark
    * rendering is shared with `streaming.Compaction.compactZOrdered` (the
    * write-side layout this audit reads).
    */
  private[graft] def zInterleaveSpark(x: String, y: String): String =
    (0 until 16).map(i =>
      s"(shiftleft(shiftright($x, $i) & 1, ${2 * i})) + " +
        s"(shiftleft(shiftright($y, $i) & 1, ${2 * i + 1}))").mkString(" + ")

  private def zInterleaveDuck(x: String, y: String): String =
    (0 until 16).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q105_column_profile" -> {
      val branch = (c: String) =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows, count($c) AS n_nonnull,
           count(DISTINCT $c) AS n_distinct, round(min($c), 4) AS min_v,
           round(max($c), 4) AS max_v, round(avg($c), 4) AS avg_v FROM lineitem"""
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(branch).mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY column_name")
    },
    "q49_approx_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs,
           count(*) AS n_orders, TRUE AS within_5pct
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q90_approx_percentile" ->
      """SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
           TRUE AS p50_within_2pct, TRUE AS p99_within_2pct
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_join3" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
         count(DISTINCT c_custkey) AS n_cust
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY n_name ORDER BY n_name""",
    "q3_left_join" ->
      """SELECT n_items, count(*) AS n_orders FROM (
           SELECT o_orderkey, count(l_orderkey) AS n_items
           FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
           GROUP BY o_orderkey)
         GROUP BY n_items ORDER BY n_items""",
    "q4_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q5_anti_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q6_running_total" ->
      """SELECT day, day_rev, round(sum(day_rev) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev
         FROM (SELECT CAST(o_orderdate AS DATE) AS day,
                 round(sum(o_totalprice), 2) AS day_rev
               FROM orders GROUP BY 1)
         ORDER BY day""",
    "q7_global_index" ->
      """SELECT o_orderkey,
         row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS gix
         FROM orders ORDER BY gix LIMIT 100""",
    "q8_topk_count" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders
         GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 20""",
    "q9_topk_sum" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
         FROM orders GROUP BY o_custkey
         ORDER BY total_spend DESC, o_custkey LIMIT 20""",
    "q10_last_n" ->
      """SELECT o_orderkey, o_orderdate FROM orders
         ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 20""",
    "q11_gaps" ->
      """SELECT k FROM (SELECT unnest(generate_series(1, 200)) AS k)
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = k)
         ORDER BY k""",
    "q12_except" ->
      """SELECT * FROM (
           SELECT DISTINCT o_custkey AS custkey FROM orders
           EXCEPT
           SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
         ORDER BY custkey""",
    "q13_union" ->
      """SELECT * FROM (
           SELECT 'supplier' AS kind, s_suppkey AS key, round(s_acctbal, 2) AS acctbal FROM supplier
           UNION ALL
           SELECT 'customer' AS kind, c_custkey AS key, round(c_acctbal, 2) AS acctbal FROM customer)
         ORDER BY kind, key""",
    "q14_lag" ->
      """SELECT o_custkey, o_orderkey,
           date_diff('day', prev_date, o_orderdate) AS days_since_prev
         FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_date
               FROM orders WHERE o_custkey < 100)
         WHERE prev_date IS NOT NULL
         ORDER BY o_custkey, o_orderkey""",
    "q15_conditional_agg" ->
      """SELECT o_orderstatus,
         round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS urgent_rev,
         round(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS other_rev,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q16_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
         count(*) AS n_cust
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q17_last_per_group" ->
      """SELECT l_orderkey, l_linenumber AS last_line, round(l_quantity, 2) AS qty
         FROM (SELECT l_orderkey, l_linenumber, l_quantity, row_number()
                 OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
               FROM lineitem)
         WHERE rn = 1 ORDER BY l_orderkey""",
    "q18_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q19_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY k ORDER BY k""",
    "q20_enrich_join" ->
      """SELECT c_nationkey, count(*) AS n_purchases,
         round(sum(value), 2) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         WHERE event_type = 'purchase'
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q45_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS rev
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q46_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 8
         ORDER BY o_custkey""",
    "q47_rank_window" ->
      """SELECT o_orderstatus, o_orderkey, price, rnk, drnk FROM (
           SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price,
             rank() OVER w AS rnk, dense_rank() OVER w AS drnk
           FROM orders
           WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rnk <= 5 ORDER BY o_orderstatus, rnk, o_orderkey""",
    "q48_range_window" ->
      """SELECT dnum, day_rev, round(sum(day_rev) OVER (ORDER BY dnum
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS trailing7_rev
         FROM (SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dnum,
                 round(sum(o_totalprice), 2) AS day_rev
               FROM orders GROUP BY 1)
         ORDER BY dnum""",
    "q52_part_join" ->
      """SELECT p_brand, count(*) AS n_items,
         round(sum(l_extendedprice), 2) AS revenue,
         round(avg(l_quantity), 2) AS avg_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand ORDER BY p_brand""",
    "q53_region_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q54_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
             CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w IS NULL
                    OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800
                  THEN 1 ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, count(*) AS n_events
           FROM sessions GROUP BY user_id, session_id)
         SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
         FROM per_session GROUP BY user_id HAVING count(*) >= 3
         ORDER BY user_id""",
    "q55_percentiles" ->
      """SELECT o_orderstatus,
         round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
         round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
         round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
         count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q56_pivot" ->
      """SELECT o_orderpriority,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
         round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
         round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q57_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS uname,
         substr(c_name, 1, 8) AS prefix,
         length(c_name) AS name_len,
         regexp_replace(c_name, '0', '#', 'g') AS masked,
         concat_ws('|', c_mktsegment, c_nationkey) AS seg_key
         FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""",
    "q58_array_fingerprint" ->
      """SELECT c_nationkey, count(*) AS n,
         md5(string_agg(c_name, ',' ORDER BY c_name)) AS members_fp
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q144_zorder_layout" ->
      s"""WITH st AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
             min(l_suppkey) AS smin, max(l_suppkey) AS smax FROM lineitem),
         q AS (SELECT l_partkey, l_suppkey,
             ((l_partkey - pmin) * 65535) // greatest(1, pmax - pmin) AS qx,
             ((l_suppkey - smin) * 65535) // greatest(1, smax - smin) AS qy
           FROM lineitem CROSS JOIN st),
         z AS (SELECT l_partkey, l_suppkey,
             (${zInterleaveDuck("qx", "qy")}) AS zv FROM q),
         f AS (SELECT zv // ${1L << ZFileShift} AS file_id, count(*) AS n_rows,
             min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
             min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max
           FROM z GROUP BY 1)
         SELECT CAST(file_id AS BIGINT) AS file_id, n_rows,
           pk_min, pk_max, sk_min, sk_max,
           round(CAST(pk_max - pk_min AS DOUBLE) / greatest(1, pmax - pmin), 6)
             AS pk_span_frac,
           round(CAST(sk_max - sk_min AS DOUBLE) / greatest(1, smax - smin), 6)
             AS sk_span_frac
         FROM f CROSS JOIN st ORDER BY file_id"""
  )
}
