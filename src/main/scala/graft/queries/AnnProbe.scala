package graft.queries

import org.apache.spark.sql.SparkSession

/** ANN stage profiler (PROMOTED in r18 from the r17 temporary diagnostic;
  * that round's measurements — survivors ≈ 1.8× output at tau 0.4, staged
  * 16.2 s vs exact 12.5 s at sf10 — reversed the int8-tail hypothesis and
  * live in SCALEPROOF.md's r17 section). Splits q129's cost into its five
  * assignment stages plus BOTH pair-tail forms, so a new corpus's tail
  * choice is a measurement, not a guess:
  *
  * {{{ runMain graft.queries.AnnProbe <sfDir> [auditDir] }}}
  *
  * With `auditDir` the run also PERSISTS the tail-audit counters
  * (candidate mass / certified-survivor mass —
  * [[SimilarityQueries.annTailAudit]]), so a deployment can feed this
  * probe's evidence straight into [[SimilarityQueries.useAnnTailAudit]]
  * and let the pair tail self-select. Each stage materializes behind an
  * eager cut so its timing isolates one stage's compute; time VARIANTS in
  * fresh JVMs — a long probe JVM accumulates checkpoint blocks and its
  * late timings drift.
  */
object AnnProbe {

  final case class Stage(label: String, seconds: Double)

  /** Run the staged probe; returns (stage timings, optional (C, S)
    * tail-audit counters when `auditDir` is given).
    */
  def probe(spark: SparkSession, dir: String,
    auditDir: Option[String] = None): (Seq[Stage], Option[(Long, Long)]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Stage]
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      out += Stage(label, (System.nanoTime() - t0) / 1e9)
      r
    }
    val e = SimilarityQueries.ivf2Corpus(spark, dir)
    val (k, g) = timed("count")(SimilarityQueries.ivf2KG(e))
    val coarse1 = timed("coarse train")(
      SimilarityQueries.ivf2TrainCoarse(e, g, graft.Lineage.cut(_)))
    val vecProbes = timed("vecProbes")(
      SimilarityQueries.ivf2VecProbes(e, coarse1, graft.Lineage.cut(_)))
    val fine = timed("fine train")(
      SimilarityQueries.ivf2TrainFine(e, k, coarse1, vecProbes,
        graft.Lineage.cut(_)))
    val assigned = timed("final assign")(
      SimilarityQueries.ivf2FinalAssign(vecProbes, coarse1, fine,
        graft.Lineage.cut(_)))
    timed("exact pair tail")(
      SimilarityQueries.neardupPairsExact(assigned).count())
    timed("staged pair tail")(
      SimilarityQueries.neardupPairsStaged(assigned,
        assigned.select("vec_id", "v", "n").dropDuplicates("vec_id")).count())
    val counters = auditDir.map(ad =>
      timed("tail audit persist")(
        SimilarityQueries.annTailAudit(spark, assigned, ad)))
    (out.toSeq, counters)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val auditDir = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM once so stage timings are steady-state
    SimilarityQueries.ivf2Assigned(spark, dir).count()
    val (stages, counters) = probe(spark, dir, auditDir)
    stages.foreach(st => println(f"[probe] ${st.label}: ${st.seconds}%.2f s"))
    counters.foreach { case (c, s) =>
      println(s"[probe] candidate_mass=$c survivor_mass=$s " +
        f"ratio=${if (c > 0) s.toDouble / c else Double.NaN}%.6f " +
        s"staged_cutover=${SimilarityQueries.AnnTailSurvivorFrac}")
    }
    spark.stop()
  }
}
