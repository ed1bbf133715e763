package graft

import graft.chain._
import graft.functions.CryptoFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metamorphic/domain invariants of the chain pipeline (SURVEY.md §5):
  * the laws the reference's API tests assert (BoxRoutesSpec.scala:89-98)
  * plus conservation, cumulative monotonicity, minting and fork semantics.
  */
class ChainSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tables: ChainTables = {
    import spark.implicits._
    BlockDerivation.derive(spark.createDataset(ChainFixture.generate(80)))
  }

  test("spent and unspent partition the box set") {
    val all = tables.outputs.count()
    val spent = UtxoQueries.spentBoxes(tables).count()
    val unspent = UtxoQueries.utxos(tables).count()
    assert(spent + unspent == all, s"$spent + $unspent != $all")
    val overlap = UtxoQueries.utxos(tables)
      .join(UtxoQueries.spentBoxes(tables).select("boxId"), Seq("boxId"), "left_semi")
      .count()
    assert(overlap == 0)
  }

  test("taint propagation conserves mass, seeds at the biggest spender, matches a Scala replay") {
    val got = GraphEdges.taintFlow(tables, hops = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(t => t > 0 && t <= 1.0), s"taint in (0,1]: $got")

    // independent Scala replay off the flow edges
    val fl = GraphEdges.flows(tables).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(r.fieldIndex("totalValue")).toDouble))
    val ow = fl.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val seed = ow.toSeq.sortBy { case (s, w) => (-w, s) }.head._1
    var taint = Map(seed -> 1.0)
    for (_ <- 1 to 3) {
      val fwd = fl.filter(e => taint.contains(e._1))
        .map(e => e._2 -> taint(e._1) * e._3 / ow(e._1))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
      val retained = taint.filter { case (n, _) => !ow.contains(n) }
      taint = (fwd.keySet ++ retained.keySet).map(n =>
        n -> (fwd.getOrElse(n, 0.0) + retained.getOrElse(n, 0.0))).toMap
    }
    assert(math.abs(taint.values.sum - 1.0) < 1e-9,
      "proportional forwarding + sink retention must conserve total taint")
    val want = taint.view.mapValues(t =>
      BigDecimal(t).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .filter(_._2 > 0).toMap
    assert(got.keySet == want.keySet, "taint support must match the replay")
    got.foreach { case (n, t) =>
      assert(math.abs(t - want(n)) <= 1e-6, s"$n: $t vs ${want(n)}")
    }
  }

  test("value conservation: every non-coinbase tx spends exactly what it creates") {
    val inSums = UtxoQueries.resolvedInputs(tables)
      .groupBy("txId").agg(sum("ergValue").as("inValue"))
    val outSums = tables.outputs.groupBy("txId").agg(sum("ergValue").as("outValue"))
    val violations = tables.txs.filter(!col("coinbase"))
      .join(inSums, "txId").join(outSums, "txId")
      .filter(col("inValue") =!= col("outValue"))
      .count()
    assert(violations == 0)
  }

  test("coinbase mints exactly minerReward + blockFee") {
    val cbOut = tables.txs.filter(col("coinbase"))
      .join(tables.outputs.groupBy("txId").agg(sum("ergValue").as("cbValue")), "txId")
      .select("blockId", "cbValue")
    val violations = tables.blocks.join(cbOut, "blockId")
      .filter(col("cbValue") =!= col("minerReward") + col("blockFee"))
      .count()
    assert(violations == 0)
  }

  test("cumulative stats are monotone and global indexes are dense") {
    val rows = tables.blocks.orderBy("height")
      .select("height", "totalTxsCount", "totalFees", "maxTxGix", "maxBoxGix")
      .collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) > a.getLong(1), "totalTxsCount must strictly grow")
      assert(b.getLong(2) >= a.getLong(2))
      assert(b.getLong(3) > a.getLong(3))
      assert(b.getLong(4) > a.getLong(4))
    }
    // dense 0..N-1 global indexes with no duplicates (A5)
    val n = tables.txs.count()
    assert(tables.txs.select("globalIndex").distinct().count() == n)
    assert(tables.txs.agg(max("globalIndex")).head.getLong(0) == n - 1)
    val nb = tables.outputs.count()
    assert(tables.outputs.select("globalIndex").distinct().count() == nb)
    assert(tables.outputs.agg(max("globalIndex")).head.getLong(0) == nb - 1)
    assert(tables.blocks.agg(max("maxBoxGix")).head.getLong(0) == nb - 1)
  }

  test("tokens are minted iff tokenId equals the first input boxId, with props") {
    val minted = tables.assets.filter(col("minted"))
    assert(minted.count() > 0, "fixture must mint tokens")
    assert(minted.filter(col("tokenName").isNull).count() == 0)
    assert(minted.filter(col("tokenDecimals") =!= 2).count() == 0)
    // each minted tokenId is a real box spent by its minting tx
    val bad = minted.join(
      tables.inputs.select(col("boxId").as("tokenId"), col("txId")),
      Seq("tokenId", "txId"), "left_anti").count()
    assert(bad == 0)
  }

  test("fork resolution keeps the longer branch and drops the loser entirely") {
    import spark.implicits._
    val (all, winnerIds) = ChainFixture.generateWithFork(forkAt = 40, shortLen = 2, longLen = 5)
    val resolved = ForkResolver.mainChain(spark.createDataset(all))
    val ids = resolved.select(col("header.id")).as[String].collect().toSet
    assert(winnerIds.forall(ids.contains), "winning branch must survive")
    assert(resolved.count() == 45, "40 trunk + 5 winning blocks")
    // heights are unique and contiguous after resolution
    val derived = BlockDerivation.derive(resolved)
    assert(UtxoQueries.missingHeights(derived, 45).count() == 0)
    assert(derived.blocks.groupBy("height").count().filter(col("count") > 1).count() == 0)
    // parent links verify across the fork point (J4 linkage law)
    val broken = derived.blocks.as("c")
      .join(derived.blocks.as("p"), col("c.parentId") === col("p.blockId"))
      .filter(col("c.height") =!= col("p.height") + 1)
      .count()
    assert(broken == 0)
  }

  test("address clustering: co-spent scripts share a cluster; balance history ties out") {
    val q = graft.queries.ChainQueries.queries
    val clusters = q("q74_address_clusters")(spark, "")
      .select("ergoTreeHash", "cluster_id")
    // law 1: any two scripts spent as inputs of one tx map to one cluster
    val inScripts = UtxoQueries.resolvedInputs(tables)
      .select("txId", "ergoTreeHash").distinct()
    val perTx = inScripts.join(clusters, "ergoTreeHash")
      .groupBy("txId").agg(countDistinct("cluster_id").as("nc"))
    assert(perTx.filter(col("nc") > 1).count() == 0,
      "a tx's input scripts must share one cluster")
    // the fixture must make this non-trivial: some cluster has >1 member
    assert(q("q74_address_clusters")(spark, "").filter(col("csize") > 1).count() > 0)
    // law 2: each script's final running balance equals its live UTXO value
    val lastBal = q("q75_balance_history")(spark, "")
      .groupBy("ergoTreeHash").agg(max_by(col("balance"), col("height")).as("finalBalance"))
    val live = UtxoQueries.utxos(tables)
      .groupBy("ergoTreeHash").agg(sum("ergValue").as("liveValue"))
    val mismatch = lastBal.join(live, Seq("ergoTreeHash"), "full_outer")
      .filter(coalesce(col("finalBalance"), lit(0L)) =!= coalesce(col("liveValue"), lit(0L)))
      .count()
    assert(mismatch == 0, "final running balance must equal live UTXO value")
    // law 3: every rich-list balance equals the q75 running balance as of
    // the same height (two independent plans — anti-join reconstruction vs
    // windowed ledger — must agree on the as-of state)
    val q76 = q("q76_rich_list_at_height")(spark, "")
    val asOf = q("q75_balance_history")(spark, "")
      .filter(col("height") <= graft.queries.ChainQueries.RichListHeight)
      .groupBy("ergoTreeHash")
      .agg(max_by(col("balance"), col("height")).as("histBalance"))
    val balMismatch = q76.join(asOf, "ergoTreeHash")
      .filter(col("balance") =!= col("histBalance")).count()
    assert(balMismatch == 0, "as-of reconstruction must match the ledger window")
    assert(q76.count() == 10)
    // law 4: token holders hold only live boxes, ranks are 1..3 per token
    val th = q("q77_token_holders")(spark, "")
    assert(th.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
    assert(th.count() > 0)
  }

  test("emission closed forms match the iterative definitions") {
    val heights = Seq(1L, 100L, 525599L, 525600L, 525601L, 590400L, 777216L,
      777217L, 1000000L, 2080800L, 2145600L, 3000000L)
    import spark.implicits._
    val df = heights.toDF("h").select(
      col("h"),
      ChainConst.emissionAt(col("h")).as("em"),
      ChainConst.issuedCoinsAt(col("h")).as("issued"),
      ChainConst.minerRewardAt(col("h")).as("reward"))
    df.collect().foreach { r =>
      val h = r.getLong(0)
      assert(r.getLong(1) == ChainConst.emissionAtScala(h), s"emission @$h")
      assert(r.getLong(2) == ChainConst.issuedCoinsAtScala(h), s"issued @$h")
      assert(r.getLong(3) == ChainConst.minerRewardAtScala(h), s"reward @$h")
    }
  }

  test("tx graph edges respect dust + payback exclusion") {
    val edges = GraphEdges.txEdges(tables, dust = 1000000L)
    assert(edges.count() > 0)
    assert(edges.filter(col("value") < 1000000L).count() == 0)
    // no (txId, script) appears as both from and to (payback exclusion)
    val both = edges.groupBy("txId", "ergoTreeHash")
      .agg(countDistinct("direction").as("d"))
      .filter(col("d") > 1).count()
    assert(both == 0)
  }

  test("q150 triangles == brute-force recompute over the q82 flow graph") {
    val edges = SparkEntry.queries("q82_chain_flows")(spark, sf0001)
      .select("src", "dst").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(e => e._1 != e._2)
      .map(e => if (e._1 < e._2) e else e.swap).toSet
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
      .withDefaultValue(Set.empty[String])
    def linked(x: String, y: String): Boolean =
      if (x < y) adj(x)(y) else adj(y)(x)
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triCount = new scala.collection.mutable.HashMap[String, Long]()
      .withDefaultValue(0L)
    for {
      i <- verts.indices; j <- (i + 1) until verts.size
      if linked(verts(i), verts(j))
      k <- (j + 1) until verts.size
      if linked(verts(i), verts(k)) && linked(verts(j), verts(k))
    } Seq(verts(i), verts(j), verts(k)).foreach(v => triCount(v) += 1)
    val expected = triCount.toSeq
      .sortBy { case (v, n) => (-n, v) }.take(10)
    val got = SparkEntry.queries("q150_graph_triangles")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"\n got $got\n exp $expected")
    assert(got.nonEmpty && got.head._2 > 0, "fixture graph must contain triangles")
  }
}

class CryptoSpec extends AnyFunSuite {

  test("blake2b-256 matches RFC 7693 vectors") {
    def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
    assert(hex(CryptoFunctions.blake2b256("abc".getBytes)) ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(hex(CryptoFunctions.blake2b256(Array.empty)) ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
  }

  test("ergo address codec round-trips P2PK and P2S trees with checksum validation") {
    // P2PK: 0008cd + 33-byte pubkey
    val pk = "02" + "ab" * 32
    val p2pkTree = "0008cd" + pk
    val addr = CryptoFunctions.ergoTreeToAddress(p2pkTree)
    assert(CryptoFunctions.addressToErgoTree(addr).contains(p2pkTree))
    assert(addr.startsWith("9"), s"mainnet P2PK addresses start with 9, got $addr")
    // P2S: arbitrary script
    val script = "d19683030191a38cc7a701"
    val p2s = CryptoFunctions.ergoTreeToAddress(script)
    assert(CryptoFunctions.addressToErgoTree(p2s).contains(script))
    assert(p2s != addr)
    // checksum tampering is rejected
    val tampered = addr.init + (if (addr.last == '1') '2' else '1')
    assert(CryptoFunctions.addressToErgoTree(tampered).isEmpty)
    assert(CryptoFunctions.addressToErgoTree("not-base58-0OIl").isEmpty)
  }

  test("base58 round-trips and matches the known vector") {
    assert(CryptoFunctions.base58Encode("Hello World!".getBytes) == "2NEpo7TZRRrLZSi2U")
    val cases = Seq(
      Array[Byte](0, 0, 1, 2, 3), Array[Byte](0), Array[Byte](),
      Array.tabulate[Byte](64)(_.toByte))
    cases.foreach { bytes =>
      val enc = CryptoFunctions.base58Encode(bytes)
      assert(CryptoFunctions.base58Decode(enc).get.sameElements(bytes),
        s"round-trip failed for ${bytes.toSeq}")
    }
  }
}
