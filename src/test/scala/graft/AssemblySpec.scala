package graft

import graft.queries.AssemblyQueries
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the corpus-assembly operators (q131–q134) —
  * laws the DuckDB oracle's value-hash can't express: coverage/overlap
  * geometry of the chunking, conservation of the packing manifest,
  * cap/rate bounds of the samplers, and the plan shapes (broadcast dims,
  * no unkeyed join anywhere).
  */
class AssemblySpec extends AnyFunSuite {
  import TestSpark._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q131 chunking: geometry — sizes, overlap, full coverage, reconstruction") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') AS tk")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = q("q131_context_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)

    assert(chunks.keySet == docs.keySet, "every doc must produce chunks")
    chunks.foreach { case (id, cs) =>
      val n = docs(id).size
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.size).toSeq,
        s"doc $id: chunk indexes must be dense from 0")
      val expected = if (n <= AssemblyQueries.ChunkLen) 1
      else math.ceil((n - AssemblyQueries.ChunkLen).toDouble /
        AssemblyQueries.ChunkStride).toInt + 1
      assert(sorted.size == expected, s"doc $id: chunk count")
      sorted.foreach { case (_, i, text, nt) =>
        val from = (i * AssemblyQueries.ChunkStride).toInt
        val want = docs(id).slice(from, from + AssemblyQueries.ChunkLen)
        assert(text == want.mkString(" "), s"doc $id chunk $i: exact token slice")
        assert(nt == want.size && nt <= AssemblyQueries.ChunkLen)
      }
      // coverage: the last chunk must reach the last token
      val (_, lastI, _, lastN) = sorted.last
      assert(lastI * AssemblyQueries.ChunkStride + lastN == n,
        s"doc $id: chunks must cover the full token stream")
    }
  }

  test("q132 packing: conservation + dense contiguous windows per shard") {
    val rows = q("q132_sequence_pack").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getLong(6)))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) AS nt")
      .collect().map(r => r.getString(0) -> r.getInt(1).toLong)
    // conservation: every doc and every token lands in exactly one manifest row
    assert(rows.map(_._4).sum == docs.size, "doc conservation")
    assert(rows.map(_._6).sum == docs.map(_._2).sum, "token conservation")
    rows.groupBy(r => (r._1, r._2)).foreach { case ((src, shard), rs) =>
      val bins = rs.map(_._3).sorted.toSeq
      assert(bins.head == 0 && bins == (0L until bins.size).toSeq,
        s"($src, $shard): windows must be dense from 0 (no empty window rows)")
      // a window can be straddled by at most the one doc crossing out of it
      rs.foreach { r => assert(r._5 <= 1, s"($src, $shard) bin ${r._3}: straddles") }
    }
  }

  test("q133 mixture: rate bounds, kept-subset bounds, determinism") {
    val a = q("q133_mixture_rates").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(a.nonEmpty)
    a.foreach { case (src, nDocs, nTok, rate, nKept, keptTok) =>
      assert(rate > 0.0 && rate <= 1.0, s"$src: rate in (0,1]")
      assert(nKept <= nDocs && keptTok <= nTok, s"$src: kept is a subset")
    }
    // α = 0.5 flattening: smaller sources get a HIGHER rate (monotone check
    // over the two extremes; rate ∝ t^(α−1) is decreasing in t)
    val bySize = a.sortBy(_._3)
    assert(bySize.head._4 >= bySize.last._4,
      "temperature flattening must favor the smaller source")
    val b = q("q133_mixture_rates").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
    assert(a.toSeq == b.toSeq, "the draw must be deterministic")
  }

  test("q134 domain caps: per-domain count = min(cap, domain size), hash-ordered") {
    val kept = q("q134_domain_caps").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val domainSizes = spark.read.parquet(s"$sf001/documents.parquet")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val byDomain = kept.groupBy(r => (r._1, r._2))
    assert(byDomain.keySet == domainSizes.keySet.filter(domainSizes(_) > 0))
    byDomain.foreach { case (dom, rs) =>
      assert(rs.length == math.min(AssemblyQueries.DomainCap, domainSizes(dom)),
        s"$dom: cap")
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, s"$dom: ranks")
    }
  }

  test("q136 shards: conservation, per-source ±1 balance, full source mix") {
    val shards = q("q136_balanced_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) AS nt").collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    assert(shards.map(_._1).toSeq.sorted ==
      (0L until AssemblyQueries.NumShards).toSeq, "all shards present")
    assert(shards.map(_._2).sum == docs.size, "doc conservation")
    assert(shards.map(_._3).sum == docs.map(_._2).sum, "token conservation")
    // round-robin within each source ⇒ shard doc counts differ by at most
    // the number of sources; with ≥ NumShards docs per source, every shard
    // sees every source
    val nSources = docs.map(_._1).distinct.size
    val counts = shards.map(_._2)
    assert(counts.max - counts.min <= nSources,
      s"shard doc counts ${counts.toSeq} unbalanced beyond the ±1-per-source law")
    if (docs.groupBy(_._1).values.map(_.size).min >= AssemblyQueries.NumShards)
      assert(shards.forall(_._4 == nSources), "every shard mixes every source")
  }

  test("q132 shard arithmetic == StreamingPacking's math.floorDiv on boundary ids") {
    // The batch query and the streaming packer MUST agree on shard keys at
    // any id range — including negatives and past 2^53 where the old
    // double-floor form went inexact (round-11 verdict item 6).
    val n = AssemblyQueries.PackShardDocs
    val ids = Seq(Long.MinValue, Long.MinValue + 1, -n - 1, -n, -n + 1, -1L,
      0L, 1L, n - 1, n, n + 1, (1L << 53) - 1, 1L << 53, (1L << 53) + 1,
      (1L << 53) + n + 1, Long.MaxValue - 1, Long.MaxValue)
    import spark.implicits._
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), AssemblyQueries.shardOf("doc_id").as("shard"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == math.floorDiv(id, n),
        s"shardOf($id) must equal floorDiv($id, $n)")
    }
  }

  test("plan shapes: no unkeyed joins; q133's dim joins broadcast") {
    Seq("q131_context_chunks", "q132_sequence_pack", "q133_mixture_rates",
      "q134_domain_caps").foreach { name =>
      val plan = q(name).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: no cartesian join (the q133 crossJoin is a broadcast 1-row dim)")
      assert(!plan.contains("BroadcastNestedLoopJoin") ||
        name == "q133_mixture_rates",
        s"$name: no nested-loop join")
    }
    val p133 = q("q133_mixture_rates").queryExecution.executedPlan.toString
    assert(p133.contains("BroadcastHashJoin") || p133.contains("BroadcastExchange"),
      s"q133 must broadcast the source-stats dim:\n$p133")
    assert(!p133.contains("SortMergeJoin"),
      s"q133 must not shuffle the corpus for a 20-row dim join:\n$p133")
  }
}
