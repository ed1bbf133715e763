package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Normalize the `events.ts` column across testdata generations. Older
    * driver dumps stored parquet TIMESTAMP(NANOS) (read as Long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`); current dumps store naive
    * TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ. Engine queries
    * and the DuckDB oracle both treat the wall-clock value as UTC, so NTZ is
    * cast to TimestampType under the sessions' UTC time zone — identical
    * micros, and `unix_micros`/window arithmetic keep working.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every sf-dir query flows through here, so this is the one chokepoint
    // that guarantees the native expressions backing the shared Column
    // helpers resolve for any session (idempotent): hash60 (hash64's
    // implementation since r18), word_bigrams (TextFunctions.bigrams since
    // r19), line_structs (the docLines geometry since r19).
    graft.functions.Hash60Expression.register(spark)
    graft.functions.WordBigramsExpression.register(spark)
    graft.functions.LineStructsExpression.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integral division: `/` on longs is double division, which loses
        // sub-µs exactness for epoch-nanos ≳ 2^53 and could shift a value
        // by 1µs vs the oracle's exact integer division.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        // The cast reinterprets the naive wall-clock in the SESSION zone, so
        // it only matches the oracle's UTC reading under a UTC session. Fail
        // loudly here rather than letting a non-UTC caller silently shift
        // every ts value.
        val tz = spark.conf.get("spark.sql.session.timeZone")
        // accept any UTC-equivalent zone (Etc/UTC, GMT, +00:00, Z): the cast
        // is lossless whenever the session offset is permanently zero
        val isUtc = scala.util.Try(
          java.time.ZoneId.of(tz).getRules.isFixedOffset &&
            java.time.ZoneId.of(tz).getRules
              .getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
        ).getOrElse(false)
        require(isUtc,
          s"Tables.load requires a UTC session time zone to cast " +
            s"TIMESTAMP_NTZ ts losslessly; session has '$tz'")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
}
