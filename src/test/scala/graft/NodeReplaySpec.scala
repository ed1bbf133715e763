package graft

import graft.chain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden end-to-end replay of REAL mainnet blocks 1–4200 (the reference's
  * own canned fixtures, node-pool/src/test/resources/blocks/blocks.gz —
  * read in place, never copied) through the node-JSON decode and the full
  * derivation. This is the StreamSchedulerSpec.scala:24-85 analog with
  * harder assertions: the scheduled reward is checked against the values
  * real coinbase outputs actually paid, positional indexes against the
  * node-reported ones, and hashes against an independent JVM sha256.
  * Skipped (assume) when the reference checkout is not present.
  */
class NodeReplaySpec extends AnyFunSuite {
  import TestSpark._

  private val fixture = graft.queries.ChainOracle.MainnetFixture
  private val refRes = graft.queries.ChainOracle.ReferenceResources

  private lazy val tables: ChainTables = {
    val raw = BlockSource.fromNodeJsonLines(spark, fixture)
    val t = BlockDerivation.derive(raw, feeTree = ChainConst.MainnetFeeTree,
      protocolTrees = ChainConst.MainnetProtocolTrees)
    ChainTables(t.blocks.cache(), t.txs.cache(), t.outputs.cache(),
      t.inputs.cache(), t.assets.cache(), t.ergoTrees.cache(),
      t.ergoTreeT8s.cache(), t.dataInputs.cache(), t.registers.cache(),
      t.tokens.cache())
  }

  private def assumeFixture(): Unit =
    assume(new java.io.File(fixture).exists(), "reference fixtures not present")

  test("decodes all 4200 mainnet blocks into a contiguous linked chain") {
    assumeFixture()
    assert(tables.blocks.count() == 4200)
    assert(UtxoQueries.missingHeights(tables, 4200).count() == 0)
    assert(tables.blocks.groupBy("height").count().filter(col("count") > 1).count() == 0)
    val broken = tables.blocks.as("c")
      .join(tables.blocks.as("p"), col("c.parentId") === col("p.blockId"))
      .filter(col("c.height") =!= col("p.height") + 1).count()
    assert(broken == 0, "parent links must chain")
    // the real chain's difficulty/timestamp columns survive the decode
    assert(tables.blocks.filter(col("difficulty").isNull ||
      col("timestamp") <= 0).count() == 0)
  }

  test("the emission schedule matches what real coinbase outputs paid") {
    assumeFixture()
    // every block must contain an output paying EXACTLY the derived
    // minerReward (mainnet pays 67.5 ERG while the treasury tranche runs)
    val paid = tables.blocks.as("b")
      .join(tables.outputs.as("o"), col("b.blockId") === col("o.blockId"))
      .filter(col("o.ergValue") === col("b.minerReward"))
      .select(col("b.blockId")).distinct().count()
    assert(paid == 4200, s"only $paid/4200 blocks pay the scheduled reward")
    assert(tables.blocks.filter(col("minerReward") =!= 67500000000L).count() == 0)
    // blocks with user txs attribute their fees to the REAL fee contract
    val feeBlocks = tables.blocks.filter(col("blockFee") > 0).count()
    assert(feeBlocks > 0, "fixture range contains fee-paying blocks")
    val feeOutputs = tables.outputs
      .filter(col("ergoTree") === ChainConst.MainnetFeeTree).count()
    assert(feeOutputs > 0)
    // pin the protocol-tree constants against reality: a typo in the pinned
    // hex would silently skip the economics exclusion and wrap the Long
    // cumulative sums. Every block re-emits the emission box; the range
    // also contains foundation outputs.
    assert(tables.outputs
      .filter(col("ergoTree") === ChainConst.MainnetEmissionTree).count() == 4200,
      "the pinned emission tree must match every block's re-emission output")
    assert(tables.outputs
      .filter(col("ergoTree") === ChainConst.MainnetFoundationTree).count() > 0,
      "the pinned foundation tree must match in-range outputs")
    // and the exclusion engaged: coins-moved stays in sane (un-wrapped)
    // Long range instead of accumulating ~9.3e16 per block
    val tipCoins = tables.blocks.orderBy(desc("height")).limit(1)
      .select("totalCoinsInTxs").head.getLong(0)
    assert(tipCoins >= 0 && tipCoins < 4200L * 100000000000L,
      s"totalCoinsInTxs $tipCoins implies the emission box leaked into economics")
  }

  test("derived positional indexes equal the node-reported output indexes") {
    assumeFixture()
    val nodeIdx = spark.read
      .schema(BlockSource.nodeSchema)
      .json(fixture)
      .select(explode(col("blockTransactions.transactions")).as("tx"))
      .select(explode(col("tx.outputs")).as("o"))
      .select(col("o.boxId").as("boxId"), col("o.index").as("nodeIndex"))
    val mismatches = tables.outputs.select(col("boxId"), col("index"))
      .join(nodeIdx, "boxId")
      .filter(col("index") =!= col("nodeIndex"))
      .count()
    assert(mismatches == 0, "posexplode indexes must equal the node's")
  }

  test("tree hashes, templates, addresses and registers hold on real scripts") {
    assumeFixture()
    // independent JVM sha256 over the raw tree hex for a sample
    val sample = tables.outputs.select("ergoTree", "ergoTreeHash")
      .distinct().limit(50).collect()
    assert(sample.nonEmpty)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    sample.foreach { r =>
      val bytes = r.getString(0).grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      val expect = md.digest(bytes).map("%02x".format(_)).mkString
      assert(r.getString(1) == expect, s"hash mismatch for ${r.getString(0).take(16)}")
    }
    // P2PK trees have no template; each real P2PK renders a mainnet '9...'
    // address that round-trips through the base58+blake2b checksum codec
    val p2pk = tables.ergoTrees
      .filter(col("hex").startsWith("0008cd")).limit(20).collect()
    assert(p2pk.nonEmpty)
    p2pk.foreach { r =>
      val addr = r.getAs[String]("address")
      assert(addr.startsWith("9"), s"mainnet P2PK address must start with 9: $addr")
      assert(graft.functions.CryptoFunctions.addressToErgoTree(addr)
        .contains(r.getAs[String]("hex")), s"address round-trip failed: $addr")
    }
    // the fee contract is constant-segregated: the walker must extract a
    // template for it, and every real register must decode or degrade to
    // SUnparsed without throwing (52 non-empty registers in range)
    assert(tables.ergoTreeT8s.count() > 0, "segregated trees must yield templates")
    // every real register in range is a Coll[SInt] ([2,720] reward params)
    // or Coll[SByte] payload — the walker must FULLY decode them, not
    // degrade to the SUnparsed passthrough
    assert(tables.registers.count() > 0, "real registers must surface")
    assert(tables.registers.filter(!col("sigmaType").startsWith("Coll[")).count() == 0,
      "all in-range mainnet registers are collections and must decode")
  }

  test("corrupt lines in a node dump are dropped, not fatal") {
    assumeFixture()
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    val f = dir.resolve("blocks.jsonl")
    val good = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(fixture))).getLines().take(5).toSeq
    // three corruption classes: unparseable text, wrong-shape JSON, and a
    // WELL-FORMED header-only line (valid header.id but no transactions —
    // the one PERMISSIVE parsing alone would let through to NPE)
    java.nio.file.Files.write(f,
      (good.take(2) ++ Seq(
        "not json at all",
        """{"header":{"broken":true}}""",
        """{"header":{"id":"ab","height":3,"timestamp":1,"nBits":1,"version":1,"difficulty":"1","powSolutions":{"pk":"x","w":"y","n":"z"}}}""") ++
        good.drop(2)).mkString("\n").getBytes)
    val got = BlockSource.fromNodeJsonLines(spark, f.toString)
    assert(got.count() == 5, "5 good blocks survive, 3 corrupt lines drop")
  }

  test("spendingProof context extensions survive the node decode") {
    // real dApp/oracle txs carry non-empty context extensions; the fixture
    // range does not, so pin the passthrough on a synthetic node line
    // (reference decodes them as arbitrary JSON — Codecs.scala
    // apiSpendingProofDecoder)
    val dir = java.nio.file.Files.createTempDirectory("graft-ext")
    val f = dir.resolve("block.jsonl")
    val line =
      """{"header":{"id":"h1","parentId":"h0","version":1,"height":1,""" +
        """"nBits":1,"difficulty":"1","timestamp":1,"stateRoot":"s",""" +
        """"adProofsRoot":"a","transactionsRoot":"t","extensionHash":"e",""" +
        """"powSolutions":{"pk":"p","w":"w","n":"n","d":"0"},"votes":"000000"},""" +
        """"blockTransactions":{"headerId":"h1","transactions":[{"id":"tx1",""" +
        """"inputs":[{"boxId":"b1","spendingProof":{"proofBytes":"aa",""" +
        """"extension":{"10":"0e02abcd","2":"0402"}}}],""" +
        """"outputs":[{"boxId":"o1","value":1,"creationHeight":1,""" +
        """"ergoTree":"00","assets":[],"additionalRegisters":{},"index":0}]}]},""" +
        """"extension":{"headerId":"h1","digest":"d",""" +
        """"fields":[["0100","02"],["01","va\"l"]]}}"""
    java.nio.file.Files.write(f, line.getBytes)
    val raw = BlockSource.fromNodeJsonLines(spark, f.toString).collect()
    assert(raw.length == 1)
    val proof = raw.head.transactions.transactions.head.inputs.head.spendingProof.get
    assert(proof.proofBytes.contains("aa"))
    // numeric varId order ("2" before "10"), not lexical
    assert(proof.extension == """{"2":"0402","10":"0e02abcd"}""")
    // extension fields render as VALID JSON even with a quote in a value
    val fields = raw.head.extension.fields
    assert(fields == """{"0100":"02","01":"va\"l"}""")
    assert(spark.range(1)
      .select(get_json_object(lit(fields), "$.01")).head.getString(0) == """va"l""")
    // a tx with no spendingProof at all still decodes (extension absent)
    val line2 = line.replace(
      """"spendingProof":{"proofBytes":"aa","extension":{"10":"0e02abcd","2":"0402"}}""",
      """"spendingProof":{"proofBytes":"bb"}""")
    java.nio.file.Files.write(f, line2.getBytes)
    val raw2 = BlockSource.fromNodeJsonLines(spark, f.toString).collect()
    assert(raw2.head.transactions.transactions.head
      .inputs.head.spendingProof.get.extension == "{}")
  }

  test("malformed extension-field shapes are kept faithfully, not dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ext2")
    val f = dir.resolve("block.jsonl")
    val line =
      """{"header":{"id":"h1","parentId":"h0","version":1,"height":1,""" +
        """"nBits":1,"difficulty":"1","timestamp":1,"stateRoot":"s",""" +
        """"adProofsRoot":"a","transactionsRoot":"t","extensionHash":"e",""" +
        """"powSolutions":{"pk":"p","w":"w","n":"n","d":"0"},"votes":"000000"},""" +
        """"blockTransactions":{"headerId":"h1","transactions":[]},""" +
        """"extension":{"headerId":"h1","digest":"d",""" +
        """"fields":[["0100","02"],["orphan"]]}}"""
    java.nio.file.Files.write(f, line.getBytes)
    val raw = BlockSource.fromNodeJsonLines(spark, f.toString).collect()
    // a non-pair entry degrades the whole field set to a JSON array form —
    // still valid JSON, nothing silently lost
    assert(raw.head.extension.fields == """[["0100","02"],["orphan"]]""")
  }

  test("real fork fixtures resolve to the reference's winning branch") {
    assumeFixture()
    val forkDir = s"$refRes/forks"
    assume(new java.io.File(s"$forkDir/forks_longer.txt").exists())
    // both competing real branches (shorter: 7 blocks, longer: 10, common
    // trunk through height 4) — the StreamSchedulerSpec.scala:78-83 scenario
    val both = {
      import spark.implicits._
      BlockSource.fromNodeJsonLines(spark, s"$forkDir/forks_shorter.txt")
        .unionByName(BlockSource.fromNodeJsonLines(spark, s"$forkDir/forks_longer.txt"))
        .toDF().withColumn("_bid", col("header.id")).dropDuplicates("_bid")
        .drop("_bid").as[RawBlock]
    }
    val resolved = ForkResolver.mainChain(both)
    val expected = scala.io.Source.fromFile(s"$forkDir/forkIds_longer.txt")
      .getLines().map(_.trim).filter(_.nonEmpty).toSet
    import spark.implicits._
    val got = resolved.select(col("header.id")).as[String].collect().toSet
    assert(got == expected, s"winner mismatch: got ${got.size}, want ${expected.size}")
    // and the winners derive a clean contiguous chain
    val t = BlockDerivation.derive(resolved,
      feeTree = ChainConst.MainnetFeeTree,
      protocolTrees = ChainConst.MainnetProtocolTrees)
    assert(t.blocks.count() == 10)
    assert(UtxoQueries.missingHeights(t, 10).count() == 0)
  }

  test("incremental warehouse ingest of real blocks equals one-shot derivation") {
    assumeFixture()
    import org.apache.spark.sql.functions.desc
    val dir = java.nio.file.Files.createTempDirectory("graft-mainnet-ingest").toString
    val ingest = new graft.streaming.ChainIngest(dir,
      feeTree = ChainConst.MainnetFeeTree,
      protocolTrees = ChainConst.MainnetProtocolTrees)
    val raw = BlockSource.fromNodeJsonLines(spark, fixture)
    Seq((0, 1400), (1401, 2800), (2801, 4200)).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        ingest.processBatch(
          raw.filter(col("header.height").between(lo, hi)).as(raw.encoder), i.toLong)
    }
    val streamed = ingest.blocks(spark)
    assert(streamed.count() == 4200)
    val sTip = streamed.orderBy(desc("height")).limit(1).collect()(0)
    val bTip = tables.blocks.orderBy(desc("height")).limit(1).collect()(0)
    Seq("totalTxsCount", "totalFees", "totalMinersReward", "totalCoinsInTxs",
      "maxTxGix", "maxBoxGix").foreach { c =>
      assert(sTip.getAs[Long](c) == bTip.getAs[Long](c), s"tip $c mismatch")
    }
    // the maintained UTXO view equals the one-shot anti-join on real data
    assert(ingest.utxo(spark).count() == UtxoQueries.utxos(tables).count())
  }

  test("the real unconfirmed-tx fixture flows through the mempool detector") {
    assumeFixture()
    val mempoolFile = s"$refRes/transactions/unconfirmed.json"
    assume(new java.io.File(mempoolFile).exists())
    import spark.implicits._
    // the node serves a JSON ARRAY of the same tx shape blocks carry
    val nodeTxs = spark.read
      .schema(org.apache.spark.sql.Encoders.product[NodeTx].schema)
      .option("multiLine", true).json(mempoolFile)
      .as[NodeTx].collect()
    assert(nodeTxs.length == 9, "reference fixture holds 9 unconfirmed txs")
    val t0 = new java.sql.Timestamp(1700000000000L)
    val pool = nodeTxs.map(NodeBlock.toRawTx).map(tx =>
      graft.streaming.MempoolTx(tx.id, t0, tx.inputs, tx.outputs))
    val txDf = spark.createDataset(pool.toSeq).toDF()
    // detector against the REAL 4200-block UTXO set; threshold 0 alerts
    // every tx with any non-payback, non-fee external output
    val feeHash = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(ChainConst.MainnetFeeTree.grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray)
        .map("%02x".format(_)).mkString
    }
    val detector = new graft.streaming.MempoolStream.HighValueDetector(0L, feeHash)
    val alerts = detector.onNewTransactions(txDf, UtxoQueries.utxos(tables)).collect()
    assert(alerts.nonEmpty && alerts.length <= 9)
    assert(alerts.forall(_.getAs[Long]("transferredValue") > 0))
  }

  test("the real-chain UTXO set obeys the partition law at the tip") {
    assumeFixture()
    val all = tables.outputs.count()
    val spent = UtxoQueries.spentBoxes(tables).count()
    val unspent = UtxoQueries.utxos(tables).count()
    assert(spent + unspent == all)
    assert(unspent > 0 && spent > 0)
    // cumulative columns are monotone over the real chain
    val rows = tables.blocks.orderBy("height")
      .select("totalTxsCount", "maxBoxGix").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(0) > a.getLong(0) && b.getLong(1) > a.getLong(1))
    }
  }
}
