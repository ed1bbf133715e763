package graft

import graft.queries.{AssemblyQueries, CorpusBuild}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The terminal materializer's contract: the written corpus contains
  * exactly the kept docs, routed to their leakage-free splits, balanced
  * across shards per (split, source), chunked with the exact q131
  * geometry — and the manifest agrees with the files byte for byte.
  */
class CorpusBuildSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val root = {
    val dir = Files.createTempDirectory("graft-cbuild").toString + "/corpus"
    CorpusBuild.run(spark, sf0001, dir)
    dir
  }
  private lazy val out = CorpusBuild.latest(spark, root).get

  test("written docs = q108 kept ∩ their q126 splits; partition pruning works") {
    val written = spark.read.parquet(out)
    val kept = SparkEntry.queries("q108_clean_export")(spark, sf0001)
      .filter(col("reason") === "kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val splits = SparkEntry.queries("q126_cluster_split")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap

    val gotDocs = written.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(gotDocs == kept, "the corpus must hold exactly the kept docs")
    written.select("doc_id", "split").distinct().collect().foreach { r =>
      assert(splits(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} must sit in its q126 split")
    }
    // the layout IS the access path: a split read must touch only its dir
    val trainOnly = spark.read.parquet(out).filter(col("split") === "train")
    val scanned = trainOnly.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters") && scanned.contains("split"),
      s"split filter must prune at the directory level:\n$scanned")
  }

  test("chunks reproduce q131 geometry; shards balance per (split, source)") {
    val written = spark.read.parquet(out).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("chunk_idx")),
        r.getString(r.fieldIndex("chunk_text")),
        r.getLong(r.fieldIndex("chunk_tokens"))))
    val q131 = SparkEntry.queries("q131_context_chunks")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    written.groupBy(_._1).foreach { case (id, cs) =>
      assert(cs.toSet == q131(id).toSet,
        s"doc $id: written chunks must be q131's exactly")
    }

    val perDomain = spark.read.parquet(out)
      .select(col("split"), col("source"), col("shard").cast("long").as("shard"),
        col("doc_id")).distinct()
      .groupBy("split", "source", "shard").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    perDomain.foreach { case ((split, source), counts) =>
      assert(counts.max - counts.min <= 1,
        s"($split, $source): round-robin must balance within ±1, got ${counts.toSeq}")
    }
  }

  test("manifest agrees with the written files and with itself") {
    val manifest = spark.read.parquet(s"$out/_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val recomputed = spark.read.parquet(out)
      .groupBy(col("split"), col("shard").cast("long").as("shard"))
      .agg(countDistinct("doc_id"), count(lit(1)), sum("chunk_tokens"),
        countDistinct("source"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(manifest == recomputed, "manifest must match the files")
    assert(manifest.nonEmpty && manifest.keys.map(_._1).toSet.size >= 2,
      "at least two splits must materialize at sf0.001")
  }

  test("publishes are versioned and atomic: torn temp dirs never surface") {
    assert(out.endsWith("/v=0"), s"first publish must claim v=0: $out")
    // a crashed build = a stray _tmp_ dir with partial bytes — invisible
    // to latest() and to any reader of the published version
    val junk = Files.createDirectories(
      java.nio.file.Paths.get(root, "_tmp_crashed"))
    Files.writeString(junk.resolve("part-00000.parquet"), "torn bytes")
    assert(CorpusBuild.latest(spark, root).get == out,
      "a torn temp dir must not become the latest version")
    // a second build publishes v=1 without disturbing v=0's files
    val m0 = spark.read.parquet(s"$out/_manifest").collect().toSet
    CorpusBuild.run(spark, sf0001, root)
    val out1 = CorpusBuild.latest(spark, root).get
    assert(out1.endsWith("/v=1"), s"second publish must claim v=1: $out1")
    assert(spark.read.parquet(s"$out/_manifest").collect().toSet == m0,
      "an earlier version must be immutable under later publishes")
    assert(spark.read.parquet(s"$out1/_manifest").collect().toSet == m0,
      "deterministic builds: same corpus, same manifest")
  }
}
