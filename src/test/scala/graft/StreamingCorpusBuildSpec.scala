package graft

import graft.streaming.StreamingCorpusBuild
import graft.streaming.StreamingCorpusBuild.SplitDoc
import graft.queries.CorpusBuild
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The incremental materializer's contract: kept docs streamed in doc_id
  * order across micro-batch boundaries materialize to EXACTLY the batch
  * CorpusBuild corpus (chunk rows and manifest), every publish is an
  * atomic version, and a frontier regression surfaces under _late instead
  * of corrupting the corpus.
  */
class StreamingCorpusBuildSpec extends AnyFunSuite {
  import TestSpark._

  /** The kept stream the incremental pipeline would feed: batch q108's
    * verdicts ∘ q126's splits (the deterministic ground truth the
    * streaming stores replay to), joined back to text, in arrival order.
    */
  private def keptDocs(): Array[SplitDoc] = {
    val kept = SparkEntry.queries("q108_clean_export")(spark, sf0001)
      .filter(col("reason") === "kept").select("doc_id")
    val splits = SparkEntry.queries("q126_cluster_split")(spark, sf0001)
      .select("doc_id", "split")
    spark.read.parquet(s"$sf0001/documents.parquet")
      .join(kept, "doc_id").join(splits, "doc_id")
      .select("doc_id", "source", "lang", "split", "text")
      .collect()
      .map(r => SplitDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
      .sortBy(_.docId)
  }

  private def chunkRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("chunk_idx"), col("chunk_text"),
        col("chunk_tokens"), col("source"), col("lang"), col("split"),
        col("shard").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getString(6), r.getLong(7)))
      .toSet

  private def manifestRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("split"), col("shard").cast("long"), col("n_docs"),
        col("n_chunks"), col("n_tokens"), col("n_sources"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet

  test("streamed corpus across batch boundaries == batch CorpusBuild; late regressions surface") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = keptDocs()
    assert(docs.length > 10, "fixture must keep enough docs to be meaningful")
    val mid = docs(docs.length / 2).docId

    val batchRoot = Files.createTempDirectory("graft-scb-batch").toString + "/corpus"
    CorpusBuild.run(spark, sf0001, batchRoot)
    val batchOut = CorpusBuild.latest(spark, batchRoot).get

    val out = Files.createTempDirectory("graft-scb-stream").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft-scb-ckpt").toString
    val stream = MemoryStream[SplitDoc]
    val query = StreamingCorpusBuild.route(stream.toDS(), out, ckpt,
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(docs.filter(_.docId < mid).toIndexedSeq)
      query.processAllAvailable()
      stream.addData(docs.filter(_.docId >= mid).toIndexedSeq)
      query.processAllAvailable()

      assert(chunkRows(StreamingCorpusBuild.read(spark, out)) ==
        chunkRows(spark.read.parquet(batchOut)),
        "streamed chunk rows must equal the batch corpus exactly")
      assert(manifestRows(StreamingCorpusBuild.manifest(spark, out)) ==
        manifestRows(spark.read.parquet(s"$batchOut/_manifest")),
        "streamed manifest must equal the batch manifest")
      val vBefore = CorpusBuild.latest(spark, out).get

      // frontier regression: an already-materialized doc re-delivered in a
      // LATER micro-batch must surface under _late — corpus, manifest and
      // version untouched (the re-pack queue, never a silent mis-shard)
      val before = chunkRows(StreamingCorpusBuild.read(spark, out))
      stream.addData(docs.head)
      query.processAllAvailable()
      assert(CorpusBuild.latest(spark, out).get == vBefore,
        "an all-late micro-batch must publish nothing")
      assert(chunkRows(StreamingCorpusBuild.read(spark, out)) == before,
        "a late doc must not change the corpus")
      val late = spark.read.parquet(s"$out/_late")
        .select("doc_id").collect().map(_.getLong(0))
      assert(late.toSeq == Seq(docs.head.docId),
        "the late doc must surface in the re-pack queue")
    } finally query.stop()
  }

  test("planned stream: streamed copy manifest == batch q149 kernel; plan change flags stale") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = keptDocs()
    val mid = docs(docs.length / 2).docId
    val plan = StreamingCorpusBuild.pinPlan(
      SparkEntry.queries("q141_epoch_plan")(spark, sf0001))
    val out = Files.createTempDirectory("graft-scb-plan").toString + "/corpus"
    val ckpt = Files.createTempDirectory("graft-scb-pckpt").toString
    val stream = MemoryStream[SplitDoc]
    val query = StreamingCorpusBuild.route(stream.toDS(), out, ckpt,
      trigger = Trigger.ProcessingTime(0), plan = Some(plan))
    try {
      stream.addData(docs.filter(_.docId < mid).toIndexedSeq)
      query.processAllAvailable()
      stream.addData(docs.filter(_.docId >= mid).toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "nt", "n_copies").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val streamed = StreamingCorpusBuild.copyManifest(spark, out)
    // the law: streamed manifest across batch boundaries == the batch
    // expansion kernel over the same kept docs under the same plan
    val keptNt = spark.createDataset(docs.toSeq).toDF()
      .select(col("docId").as("doc_id"), col("source"),
        size(graft.functions.TextFunctions.toks(col("text"))).cast("long")
          .as("nt"))
    assert(rows(streamed) ==
      rows(graft.queries.AssemblyQueries.expandCopies(keptNt, plan.toDF(spark))),
      "streamed expansion must equal the batch kernel exactly")
    assert(streamed.select("plan_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(plan.planId))
    assert(StreamingCorpusBuild.staleCopyDocs(spark, out, plan).isEmpty,
      "nothing is stale under the original plan")

    // late plan change: a new batch lands under a REVISED plan — its rows
    // stamp the new id, and every earlier row becomes the re-expansion
    // queue (flagged, never silently mixed into the new regime)
    val plan2 = StreamingCorpusBuild.pinPlan(
      plan.toDF(spark).withColumn("n_epochs", col("n_epochs") + 1))
    assert(plan2.planId != plan.planId)
    val newId = docs.map(_.docId).max + 1
    val late = Seq((newId, docs.head.source, "en", "train", 7L, false,
      "fresh doc under the revised plan"))
      .toDF("docId", "source", "lang", "split", "shard", "late", "text")
    StreamingCorpusBuild.appendBatch(spark, late, 99L, out, Some(plan2))
    val stale = StreamingCorpusBuild.staleCopyDocs(spark, out, plan2)
    assert(stale.select("doc_id").collect().map(_.getLong(0)).toSet ==
      docs.map(_.docId).toSet,
      "every pre-change row must flag for re-expansion")
    assert(StreamingCorpusBuild.copyManifest(spark, out).count() ==
      docs.length + 1)
  }

  test("appendBatch is idempotent under at-least-once batchId replay") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-scb-idem").toString + "/corpus"
    val batch = Seq(
      ("a", 1L, "s1", "en", "train", 2L, false, "alpha beta"),
      ("a", 2L, "s1", "en", "train", 0L, false, "gamma"))
      .toDF("k", "docId", "source", "lang", "split", "shard", "late", "text")
      .drop("k")
    StreamingCorpusBuild.appendBatch(spark, batch, 0L, out)
    val v0 = CorpusBuild.latest(spark, out).get
    val rows0 = chunkRows(StreamingCorpusBuild.read(spark, out))
    StreamingCorpusBuild.appendBatch(spark, batch, 0L, out) // replay
    assert(CorpusBuild.latest(spark, out).get == v0,
      "a replayed batchId must not claim a new version")
    assert(chunkRows(StreamingCorpusBuild.read(spark, out)) == rows0,
      "a replayed batchId must leave the corpus unchanged")
  }
}
