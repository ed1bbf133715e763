package graft

import graft.queries.{ChainQueries, SimilarityQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equality pins for the round-19 optimizations: every restructured form
  * must be bit-identical to its retained pre-r19 reference, so the DuckDB
  * oracles (and the driver's hash gate) replay unchanged.
  */
class Round19Spec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---- q129/q130 pair kernel: int8 certified prune == unfiltered kernel ----

  test("int8-pruned exact pair kernel == the r18 unfiltered kernel on the " +
    "real corpus (pairs AND rounded cosines, bit-identical)") {
    val assigned = SimilarityQueries.ivf2Assigned(spark, sf001)
      .localCheckpoint()
    val pruned = rows(SimilarityQueries.neardupPairsExact(assigned))
    val ref = rows(SimilarityQueries.neardupPairsExactRef(assigned))
    assert(pruned == ref,
      s"pruned kernel diverged from the reference: " +
        s"only-pruned=${pruned.diff(ref).take(5)} " +
        s"only-ref=${ref.diff(pruned).take(5)}")
    assert(pruned.nonEmpty)
  }

  test("int8 prune keeps degenerate members (zero vector, zero norm) on " +
    "the exact path — no pair gains or loses from the bound") {
    import spark.implicits._
    // a cohort holding a zero vector, an all-negative vector, a pair of
    // near-duplicates above tau, and an anti-correlated pair below it
    val base = Seq(
      (0L, 2L, Seq(0.0, 0.0, 0.0, 0.0), 0.0),             // zero vector
      (0L, 3L, Seq(1.0, 1.0, 1.0, 1.0), 2.0),
      (0L, 4L, Seq(1.0, 1.0, 1.0, 0.9), math.sqrt(3.81)),
      (0L, 5L, Seq(-1.0, -1.0, -1.0, -1.0), 2.0),
      (0L, 6L, Seq(1e-300, 1e-300, 0.0, 0.0), math.sqrt(2.0) * 1e-300)
    ).toDF("c_id", "vec_id", "v", "n")
    val pruned = rows(SimilarityQueries.neardupPairsExact(base))
    val ref = rows(SimilarityQueries.neardupPairsExactRef(base))
    assert(pruned == ref, s"degenerate cohort diverged: $pruned vs $ref")
    assert(pruned.nonEmpty) // the (3,4) near-dup pair must survive
  }

  // ---- chain graph consumers: shared flow table == per-query derivation ----

  test("sharedFlows rows == GraphEdges.flows rows (q82's independent " +
    "derivation) at the chain dust threshold") {
    val shared = rows(ChainQueries.sharedFlows(spark))
    val q82 = rows(SparkEntry.queries("q82_chain_flows")(spark, sf001))
    assert(shared == q82, "shared flow table diverged from q82's derivation")
    assert(shared.nonEmpty)
  }

  test("pageRank and taintFlow over the shared flow table == their own " +
    "flow derivation, bit-identical") {
    val t = ChainQueries.fixtureTables(spark)
    val shared = ChainQueries.sharedFlows(spark)
    val prShared = rows(graft.chain.GraphEdges.pageRank(t, iters = 3,
      dust = 1000000L, precomputedFlows = Some(shared)))
    val prOwn = rows(graft.chain.GraphEdges.pageRank(t, iters = 3,
      dust = 1000000L))
    assert(prShared == prOwn, "pageRank diverged on the shared flow table")
    val tfShared = rows(graft.chain.GraphEdges.taintFlow(t, hops = 3,
      dust = 1000000L, precomputedFlows = Some(shared)))
    val tfOwn = rows(graft.chain.GraphEdges.taintFlow(t, hops = 3,
      dust = 1000000L))
    assert(tfShared == tfOwn, "taintFlow diverged on the shared flow table")
    assert(prShared.nonEmpty && tfShared.nonEmpty)
  }

  // (q80's collect_list/array_sort top-3 candidate was value-pinned here,
  // measured SLOWER at sf10/sf10z, and removed — the rejection numbers
  // live at the q80 site in TextQueries.)
}
