package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a comma-separated subset of `SparkEntry.queries` at a
  * given sf dir (min of `reps`, after one warm-up run) — for targeted
  * scale-ratio checks without a full Bench pass.
  *
  * Usage: runMain graft.TimeQueries <sfDir> <q1,q2,...> [reps]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <q1,q2,...> [reps]")
    val Array(sfDir, names) = args.take(2)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.split(",").foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up (codegen + fixture caches)
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s min ${samples.min}%7.2f s  med ${samples.sorted.apply(reps / 2)}%7.2f s")
    }
    spark.stop()
  }
}
