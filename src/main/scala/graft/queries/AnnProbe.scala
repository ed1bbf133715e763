package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY diagnostic main (r17): split q129's cost between the
  * assignment pipeline and the pair tail, and measure the int8
  * prefilter's bite. Not part of the query surface.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    SimilarityQueries.ivf2Assigned(spark, dir).count()
    // fresh stage-by-stage build with eager cuts so each timing isolates
    // one stage's compute + materialization
    val e = SimilarityQueries.ivf2Corpus(spark, dir)
    val (k, g) = timed("count")(SimilarityQueries.ivf2KG(e))
    println(s"[probe] k=$k g=$g")
    val coarse1 = timed("coarse train")(
      SimilarityQueries.ivf2TrainCoarse(e, g, graft.Lineage.cut(_)))
    val vecProbes = timed("vecProbes")(
      SimilarityQueries.ivf2VecProbes(e, coarse1, graft.Lineage.cut(_)))
    val fine = timed("fine train")(
      SimilarityQueries.ivf2TrainFine(e, k, coarse1, vecProbes, graft.Lineage.cut(_)))
    val assigned = timed("final assign")(
      SimilarityQueries.ivf2FinalAssign(vecProbes, coarse1, fine, graft.Lineage.cut(_)))
    timed("exact pair tail")(
      SimilarityQueries.ivf2Pairs(assigned).count())
    spark.stop()
  }
}
