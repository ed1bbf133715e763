package graft

import graft.streaming.StreamingDecon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming decontamination contract: vectors arriving as a file stream
  * are screened against the FIXED benchmark surface on arrival, and the
  * flags are batching-independent — streamed non-eval vectors across a
  * micro-batch boundary produce exactly batch q135's flag set.
  */
class DeconStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed decon flags == batch q135, across a micro-batch boundary") {
    val corpus = Files.createTempDirectory("graft-sdecon-corpus").toString
    Files.copy(Paths.get(sf001, "embeddings.parquet"),
      Paths.get(corpus, "embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val src = Files.createTempDirectory("graft-sdecon-src").toString
    val out = Files.createTempDirectory("graft-sdecon-out").toString + "/flags"
    val ckpt = Files.createTempDirectory("graft-sdecon-ckpt").toString

    // the stream carries the NON-eval rows (q135's candidate side), split
    // into two files so maxFilesPerTrigger=1 forces a batch boundary
    val e = spark.read.parquet(s"$corpus/embeddings.parquet")
      .filter(col("vec_id") % 29 =!= 0 || col("vec_id") >= 2000)
    val mid = e.agg(max("vec_id")).head.getLong(0) / 2
    Seq(col("vec_id") < mid, col("vec_id") >= mid).zipWithIndex.foreach {
      case (pred, i) =>
        val tmp = Files.createTempDirectory(s"graft-sdecon-half$i").toString
        e.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        Files.copy(part.toPath, Paths.get(src, s"half$i.parquet"))
    }

    val q = StreamingDecon.screen(spark, src, corpus, out, ckpt,
      maxFilesPerTrigger = 1)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("vec_id", "eval_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = SparkEntry.queries("q135_semantic_decon")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch,
      s"arrival-time flags must equal the batch audit:\n" +
        s" onlyStreamed=${(streamed -- batch).take(5)}\n" +
        s" onlyBatch=${(batch -- streamed).take(5)}")
    assert(streamed.nonEmpty, "the corpus contains contaminated vectors")
  }
}
