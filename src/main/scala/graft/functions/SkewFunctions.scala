package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew instrumentation + mitigation (SURVEY.md §4 — the reference's
  * "supernode problem": a handful of scripts hold millions of UTXOs, so
  * one-key-per-reducer aggregation melts; SuperNodeMvMap routes hot keys to
  * dedicated maps, threshold 500 ops, SuperNodeCounter.scala:8-19).
  *
  * Spark translation: (a) AQE covers join skew; (b) groupBy skew is handled
  * by two-phase salted aggregation — partial per (key, salt), final per key
  * — which bounds any single reducer to ~1/salts of the hot key; (c) the
  * hot-key *report* (K6) stays as a diagnostic query feeding the salt-list.
  */
object SkewFunctions {

  /** A8/K6: per-key op counters over a change stream (adds/removes per key),
    * hot if any counter exceeds `threshold`.
    */
  def hotKeyStats(changes: DataFrame, key: String, threshold: Long = 500): DataFrame =
    changes
      .groupBy(key)
      .agg(
        count(lit(1)).as("ops"),
        sum(when(col("op") === "add", 1).otherwise(0)).as("added"),
        sum(when(col("op") === "remove", 1).otherwise(0)).as("removed"))
      .filter(col("ops") > threshold)
      .orderBy(desc("ops"), asc(key))

  /** Two-phase salted sum: stage 1 aggregates per (key, salt-of-row) —
    * map-side combine already collapses most of it — stage 2 merges the ≤
    * `salts` partials per key. The hot key's shuffle load drops from
    * |rows(key)| to `salts`. The salt derives from `spark_partition_id()`
    * (stable under task retries — a re-run task re-reads the same input
    * split), NOT `monotonically_increasing_id()` (which would make retried
    * partials land in different buckets and the query non-deterministic).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pcount"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pcount").as("count"))

  /** Salted top-K by count: same two-phase shape for the reference's
    * top-address stats (StatsService.scala:12-35) under supernode skew.
    */
  def saltedTopKByCount(df: DataFrame, key: String, k: Int, salts: Int = 16): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_pcount"))
      .groupBy(col(key))
      .agg(sum("_pcount").as("count"))
      .orderBy(desc("count"), asc(key))
      .limit(k)

  // ---- learned hot-key list (S6 + SuperNodeCollector.scala:13-65) ----

  /** S6: load the persisted hot-key list (plain or gzipped line file — the
    * reference ships `*.gz` defaults and appends learned keys) for use as a
    * broadcast salt-list.
    */
  def loadHotKeys(spark: org.apache.spark.sql.SparkSession, path: String): Set[String] =
    spark.read.textFile(path).collect().map(_.trim).filter(_.nonEmpty).toSet

  /** Targeted salting — the faithful translation of the reference's
    * supernode design: ONLY keys on the learned hot list are salted (cold
    * keys keep salt 0 and aggregate in one pass); the hot list is tiny and
    * broadcast inside the `isin` literal.
    */
  def saltedSumWithHotList(df: DataFrame, key: String, valueCol: String,
    hotKeys: Set[String], salts: Int = 16): DataFrame = {
    val salt =
      if (hotKeys.isEmpty) lit(0L)
      else when(col(key).isin(hotKeys.toSeq: _*),
        pmod(xxhash64(col(key), spark_partition_id()), lit(salts)))
        .otherwise(0L)
    df
      .withColumn("_salt", salt)
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pcount"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pcount").as("count"))
  }
}
