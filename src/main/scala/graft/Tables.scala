package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
