package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Persistent ANN index contract (r09 VERDICT #4): train once, serve many —
  * consecutive serves reuse the snapshot (no second Lloyd pass), the
  * staleness stamp advances with the corpus, a fresh application adopts
  * matching on-disk snapshots without retraining, and the served rows are
  * identical to q129's ad-hoc train+serve.
  */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._
  import graft.queries.AnnIndex

  private def tuples(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("train once, serve many, adopt-on-restart, retrain on corpus change") {
    val dir = Files.createTempDirectory("graft-ann-corpus").toString
    Files.copy(Paths.get(sf0001, "embeddings.parquet"),
      Paths.get(dir, "embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val snap = Files.createTempDirectory("graft-ann-snap").toString

    // first serve mounts (exactly one training run) and matches q129
    val t0 = AnnIndex.trainCount
    val served1 = tuples(AnnIndex.servedPairs(spark, dir, "tann_", snap).collect())
    assert(AnnIndex.trainCount == t0 + 1, "first serve must train the index")
    val adhoc = tuples(
      SparkEntry.queries("q129_ivf2_neardup")(spark, dir).collect())
    assert(served1 == adhoc, "served pairs must equal q129's ad-hoc result")

    // second serve: NO retraining, snapshot version chain untouched
    val served2 = tuples(AnnIndex.servedPairs(spark, dir, "tann_", snap).collect())
    assert(served2 == adhoc)
    assert(AnnIndex.trainCount == t0 + 1, "second serve must reuse the index")
    assert(!AnnIndex.refresh(spark, dir, "tann_", snap),
      "an up-to-date index must not retrain")
    val vs = new java.io.File(s"$snap/fine").list().toSeq
      .filter(_.startsWith("v="))
    assert(vs == Seq("v=0"), s"serving must not grow the version chain: $vs")

    // the served plan really reads the parquet snapshots and contains no
    // centroid-update aggregation (the Lloyd pass's avg) anywhere; with
    // the stored inverted lists the serve must not even TOUCH the
    // centroid tables — one corpus scan, one assign-snapshot join, the
    // pair kernel, zero probe/assign flops
    val plan = AnnIndex.servedPairs(spark, dir, "tann_", snap, identity)
      .queryExecution.executedPlan.toString
    val snapName = new java.io.File(snap).getName
    assert(plan.contains(snapName),
      s"served pairs must come from the snapshot files:\n$plan")
    assert(!plan.contains("avg("),
      s"a served query must contain no centroid-training aggregate:\n$plan")
    assert(plan.contains("/assign/"),
      s"a serve must read the stored inverted lists:\n$plan")
    assert(!plan.contains("/coarse/") && !plan.contains("/fine/"),
      s"a fast-path serve must not re-derive assignments from centroids:\n$plan")

    // a NEW application (empty catalog) with matching snapshots on disk
    // adopts them — re-register, no retrain
    spark.sql("DROP VIEW IF EXISTS tann_coarse")
    spark.sql("DROP VIEW IF EXISTS tann_fine")
    assert(AnnIndex.indexVersion(spark, "tann_").isEmpty)
    assert(!AnnIndex.refresh(spark, dir, "tann_", snap),
      "matching durable stamp must adopt snapshots without retraining")
    assert(AnnIndex.trainCount == t0 + 1)
    assert(AnnIndex.indexVersion(spark, "tann_")
      .contains(AnnIndex.corpusVersion(spark, dir)))

    // corpus change: the fingerprint advances, refresh retrains, the
    // stamp follows
    val v0 = AnnIndex.indexVersion(spark, "tann_").get
    val f = new java.io.File(dir, "embeddings.parquet")
    assert(f.setLastModified(f.lastModified() + 2000))
    assert(AnnIndex.corpusVersion(spark, dir) != v0,
      "a corpus rewrite must advance the fingerprint")
    assert(AnnIndex.refresh(spark, dir, "tann_", snap),
      "a stale index must retrain")
    assert(AnnIndex.trainCount == t0 + 2)
    assert(AnnIndex.indexVersion(spark, "tann_")
      .contains(AnnIndex.corpusVersion(spark, dir)))
    // retrained snapshots: current + previous dirs retained (GC contract)
    val vs2 = new java.io.File(s"$snap/fine").list().toSeq
      .filter(_.startsWith("v=")).sorted
    assert(vs2 == Seq("v=0", "v=1"), s"expected current+previous, got $vs2")
  }

  test("append-only growth extends the lists without retraining; rewrites retrain") {
    import org.apache.spark.sql.functions._
    import graft.queries.AnnIndex.Maintenance
    // corpus as a DIRECTORY of parquet leaves so the ingest shape (files
    // appended over time) is the real thing under test
    val dir = Files.createTempDirectory("graft-iann-corpus").toString
    val embDir = Paths.get(dir, "embeddings.parquet")
    Files.createDirectory(embDir)
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val mid = e.agg(max("vec_id")).head.getLong(0) / 2
    def stage(pred: org.apache.spark.sql.Column, name: String): Long = {
      val tmp = Files.createTempDirectory(s"graft-iann-$name").toString
      val part = e.filter(pred).coalesce(1)
      part.write.mode("overwrite").parquet(tmp)
      val f = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(f.toPath, embDir.resolve(s"$name.parquet"))
      part.count()
    }
    val n0 = stage(col("vec_id") < mid, "half0")
    val snap = Files.createTempDirectory("graft-iann-snap").toString

    val t0 = AnnIndex.trainCount
    AnnIndex.servedPairs(spark, dir, "iann_", snap).collect()
    assert(AnnIndex.trainCount == t0 + 1)
    val before = spark.table("iann_assign").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // the second half lands as a NEW leaf — extend, don't retrain
    val n1 = stage(col("vec_id") >= mid, "half1")
    val out = AnnIndex.refreshIncremental(spark, dir, "iann_", snap,
      maxGrowth = 2.0)
    assert(out == Maintenance.Appended(n1), s"expected append, got $out")
    assert(AnnIndex.trainCount == t0 + 1, "an append must never retrain")
    val after = spark.table("iann_assign").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.subsetOf(after), "old assignments must be untouched")
    // the appended rows are exactly the stored-centroid routing of the
    // new vectors (the streaming router's kernel over the same snapshots)
    val expected = graft.streaming.StreamingAnnServe.assignBatch(
      spark, e.filter(col("vec_id") >= mid), "iann_").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after -- before == expected,
      "appended lists must equal stored-centroid routing of the new vectors")
    // idempotent
    assert(AnnIndex.refreshIncremental(spark, dir, "iann_", snap, 2.0) ==
      Maintenance.NoChange)
    // a serve on the grown index stays train-free
    AnnIndex.servedPairs(spark, dir, "iann_", snap).collect()
    assert(AnnIndex.trainCount == t0 + 1)

    // rewriting an OLD leaf is not an append — full retrain
    val h0 = embDir.resolve("half0.parquet").toFile
    assert(h0.setLastModified(h0.lastModified() + 2000))
    assert(AnnIndex.refreshIncremental(spark, dir, "iann_", snap, 2.0) ==
      Maintenance.Retrained)
    assert(AnnIndex.trainCount == t0 + 2)
  }

  test("corpusVersion sees a leaf rewrite deep in a partitioned layout (r10 ADVICE)") {
    // A partitioned corpus (embeddings.parquet/part=k/file) whose leaf is
    // rewritten in place changes no direct child's name/length, and the
    // partition dir's mtime only moves when entries are added/removed — a
    // shallow listing would serve a stale index. The fingerprint must walk
    // to the leaves.
    val dir = Files.createTempDirectory("graft-ann-part").toString
    val leafDir = Paths.get(dir, "embeddings.parquet", "part=0")
    Files.createDirectories(leafDir)
    val leaf = leafDir.resolve("chunk.parquet")
    Files.write(leaf, Array[Byte](1, 2, 3))
    val v0 = AnnIndex.corpusVersion(spark, dir)

    // in-place rewrite: same name, same length, only the leaf mtime moves
    assert(leaf.toFile.setLastModified(leaf.toFile.lastModified() + 5000))
    assert(AnnIndex.corpusVersion(spark, dir) != v0,
      "a leaf-only rewrite must advance the corpus fingerprint")
  }
}
