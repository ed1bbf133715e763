package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the adaptive MinHash band dial (the engine's analog
  * of the reference's hot-key counter report, mvstore/SuperNodeCounter
  * .scala:8-19 — measure the skew, then turn the dial): prints, for each
  * requested shard-bits setting, the LSH candidate-pair count and the
  * per-band bucket-occupancy summary (bucket count, max occupancy, Σ
  * occ·(occ−1)/2 pair mass — the exact join cost the banded self-join
  * pays).
  *
  * Usage: runMain graft.BandAudit <sfDir> [bits1,bits2,...]
  * (default: 0 and the corpus's own adaptive setting)
  */
object BandAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandAudit <sfDir> [bits1,bits2,...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val auto = queries.DedupQueries.bandShardBits(nDocs)
    val bitsList = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(0, auto).distinct)
    println(s"[audit] docs=$nDocs adaptive_bits=$auto")
    bitsList.foreach { bits =>
      val t0 = System.nanoTime()
      val cand = queries.DedupQueries.candidatePairCount(spark, sfDir, bits)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[audit] bits=$bits candidates=$cand%d (${dt}%.2f s)")
      queries.DedupQueries.bucketOccupancy(spark, sfDir, bits)
        .collect().foreach { r =>
          println(s"[audit] bits=$bits band=${r.getInt(0)} " +
            s"buckets=${r.getLong(1)} max_occ=${r.getLong(2)} " +
            s"pair_mass=${r.getLong(3)}")
        }
    }
    spark.stop()
  }
}
