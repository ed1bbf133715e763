package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness's synthetic tables (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet from it;
  * at cluster scale the same code points at a warehouse root. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles column pruning
  * and filter pushdown (verified via `.explain("formatted")` — see
  * PlanSpec).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The synthetic `events` table stores `ts` as parquet TIMESTAMP(NANOS),
    * which Spark's reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, so here the long
    * nanos-since-epoch becomes a proper TimestampType (micro precision —
    * same as DuckDB's CAST(ts AS TIMESTAMP) on the oracle side).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        // integral division: `/` on longs is double division, which loses
        // sub-µs exactness for epoch-nanos ≳ 2^53 and could shift a value
        // by 1µs vs the oracle's exact integer division.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
