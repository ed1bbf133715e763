package graft

import graft.queries.SimilarityQueries
import graft.streaming.StreamingAnnServe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming ANN serving contract: vectors arriving as a file stream are
  * routed through the STORED index (no training per batch), and routing is
  * batching-independent — any split of the stream yields the same
  * (vec_id → cell) map as the ad-hoc batch assignment (q129's).
  */
class AnnServeSpec extends AnyFunSuite {
  import TestSpark._
  import graft.queries.AnnIndex

  test("streamed routing == batch q129 assignment, independent of batching") {
    val corpus = Files.createTempDirectory("graft-sann-corpus").toString
    Files.copy(Paths.get(sf0001, "embeddings.parquet"),
      Paths.get(corpus, "embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val snap = Files.createTempDirectory("graft-sann-snap").toString
    val src = Files.createTempDirectory("graft-sann-src").toString
    val out = Files.createTempDirectory("graft-sann-out").toString + "/routes"
    val ckpt = Files.createTempDirectory("graft-sann-ckpt").toString

    // stage the stream as TWO files (two micro-batches via
    // maxFilesPerTrigger=1) so the equivalence law is exercised across a
    // batch boundary, not just on a single batch
    val e = spark.read.parquet(s"$corpus/embeddings.parquet")
    val mid = e.agg(max("vec_id")).head.getLong(0) / 2
    Seq(col("vec_id") < mid, col("vec_id") >= mid).zipWithIndex.foreach {
      case (pred, i) =>
        val tmp = Files.createTempDirectory(s"graft-sann-half$i").toString
        e.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, Paths.get(src, s"half$i.parquet"))
    }

    val t0 = AnnIndex.trainCount
    val q = StreamingAnnServe.route(spark, src, corpus, out, ckpt,
      "sann_", snap, maxFilesPerTrigger = 1)
    q.awaitTermination()
    assert(AnnIndex.trainCount == t0 + 1,
      "route() must mount once; micro-batches must never train")

    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = SimilarityQueries.ivf2Assigned(spark, corpus)
      .select("vec_id", "c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed.size == batch.size, "every vector must be routed exactly once")
    assert(streamed == batch,
      "streamed routes must equal the ad-hoc batch assignment")

    // at-least-once replay safety: foreachBatch may re-deliver a batch
    // after a crash — re-writing the SAME batchId (same content) must not
    // duplicate routes (each batch owns and overwrites outDir/batch=<id>)
    val batch0Ids = spark.read.parquet(s"$out/batch=0")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    StreamingAnnServe.writeRouted(spark,
      e.filter(col("vec_id").isInCollection(batch0Ids)), 0L, out, "sann_")
    val replayed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == streamed,
      "replaying a batchId must leave the routed output unchanged")

    // batching-independence, stated directly: per-half batch kernels
    // union to the full assignment (a vector's cell depends only on the
    // stored centroids, never on its batch cohort)
    val halves = Seq(col("vec_id") < mid, col("vec_id") >= mid).flatMap { p =>
      StreamingAnnServe.assignBatch(spark, e.filter(p), "sann_").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
    }.toMap
    assert(halves == batch)
  }
}
