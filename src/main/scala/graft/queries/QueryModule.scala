package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus (optionally) a DuckDB-dialect oracle SQL per
  * query. `SparkEntry` concatenates all modules; the driver's correctness gate
  * runs each query at sf0.01 and hash-compares against DuckDB executing the
  * oracle SQL over the same parquet files.
  *
  * Contract (see the builder brief): result column names must match the
  * oracle's exactly (the compare sorts columns by name), and results should be
  * deterministically ordered/valued — aggregates over doubles are rounded so
  * summation-order ulp noise cannot flip the hash.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
