package graft.queries

import org.apache.spark.sql.SparkSession

/** Dev timing probe: warm like Bench (shared fixture caches), then time
  * the named queries min-of-2. Usage: QTime <sfDir> <q1,q2,...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qs = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    TextQueries.warm(spark, dir)
    DedupQueries.warm(spark, dir)
    SimilarityQueries.warm(spark, dir)
    qs.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, dir).count() // warm codegen
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $q ${ts.min}%.3f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
