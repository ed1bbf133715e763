package graft.chain

import graft.functions.CryptoFunctions._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity tables derived from one pass over the raw nested block stream —
  * the full normalized model (reference db/FullBlockModel.scala:44-58,
  * LightBlockModel.scala:176-183): facts {blocks, txs, outputs, inputs,
  * dataInputs, assets, registers} + dims {ergoTrees, ergoTreeT8s, tokens}.
  */
case class ChainTables(
  blocks: DataFrame,
  txs: DataFrame,
  outputs: DataFrame,
  inputs: DataFrame,
  assets: DataFrame,
  ergoTrees: DataFrame,
  ergoTreeT8s: DataFrame,
  dataInputs: DataFrame,
  registers: DataFrame,
  tokens: DataFrame)

/** The per-block transform stage (SURVEY.md §2.3/§2.5): nested
  * `Dataset[RawBlock]` → {blocks, txs, outputs, inputs, assets, ergoTrees}
  * with positional + global indexes, coinbase flags, reward/fee economics and
  * cumulative chain statistics.
  *
  * Spark-first shape: one `posexplode` per nesting level (P1); scalar
  * derivations are codegen'd column expressions; the ONLY ordered windows run
  * over the *blocks* table (one row per block — millions of rows at full
  * chain scale, trivially windowable), never over txs/outputs (billions).
  * Global tx/box indexes (A5) = per-block running-sum base (block-level
  * window) + in-block position (partitioned window), avoiding the
  * single-partition global row_number anti-pattern.
  *
  * References: OutputBuilder.scala:20-75 (flatten + registers + minting),
  * BlockBuilder.scala:19-66 (economics + cumulative), RewardCalculator
  * .scala:38-58 (reward/fee), FullBlockBuilder.scala:66-144 (global indexes,
  * coinbase flag).
  */
object BlockDerivation {

  /** Real template extraction (ErgoTreeParser.ergoTreeHex2T8:58-81): walk
    * the tree header (segregation/size bits), VLQ constant count, and each
    * serialized constant, returning the remaining expression bytes — or
    * null for non-segregated trees (the `0008cd…` P2PK form), segregated
    * P2PK, and anything outside the implemented wire surface
    * ([[SigmaReader.treeTemplate]]).
    */
  private val templateHexUdf =
    udf((tree: String) => if (tree == null) None else SigmaReader.treeTemplate(tree))

  /** Script dim tables from the outputs entity — shared by the derivation
    * and the warehouse-backed engine view. "First block that saw the tree" =
    * earliest by height with block-id tie-break (a bare min(blockId) would
    * pick a lexicographic minimum of hashes, not the earliest block).
    */
  def scriptDims(outputs: DataFrame): (DataFrame, DataFrame) = {
    val firstSeen = min(struct(col("settlementHeight"), col("blockId")))
      .getField("blockId").as("blockId")
    val ergoTrees = outputs
      .groupBy(col("ergoTreeHash").as("hash"))
      .agg(first("ergoTree").as("hex"), firstSeen)
      .withColumn("address", ergoTreeToAddressUdf(col("hex")))
    val t8 = outputs
      .filter(col("ergoTreeT8Hash").isNotNull)
      .groupBy(col("ergoTreeT8Hash").as("hash"))
      .agg(first("ergoTreeT8Hex").as("hex"), firstSeen)
    (ergoTrees, t8)
  }

  /** `protocolTrees` (P14 applied to the economics, Const.scala:21-95
    * Protocol.{Emission,Foundation,NoPremine}): outputs paying a protocol
    * contract stay in the box tables but are EXCLUDED from the coin sums
    * (blockCoins/totalCoinsInTxs). On real mainnet data the re-emitted
    * emission box is ~9.3·10^16 nanoERG per block — the reference's plain
    * Long sum (BlockBuilder.scala:19-23) silently wraps past ~100 blocks;
    * excluding protocol boxes keeps the "coins moved in user txs" semantics
    * those columns are meant to carry, exactly and overflow-free.
    */
  /** `pin` marks the three shared sub-plans every entity table hangs off —
    * the two flatten cores (tx level, output level) and the windowed blocks
    * table. Batch queries leave it as `identity` (one action evaluates the
    * whole DAG once, lazily); the ingest path passes a persist hook so its
    * 8 fan-out table writes + tip/delta actions compute the UDF-heavy
    * decode ONCE per micro-batch instead of once per action.
    */
  def derive(raw: Dataset[RawBlock], feeTree: String = ChainFixture.FeeTree,
    protocolTrees: Seq[String] = Nil,
    pin: DataFrame => DataFrame = identity): ChainTables = {
    val spark = raw.sparkSession

    // P1: block → tx flatten with positional index; coinbase = last tx.
    // `outSizes` (per-block array of each tx's output count) rides along so
    // the per-tx box-prefix below is a pure array fold — the alternative, a
    // window over the EXPLODED outputs, is a full-width shuffle+sort of
    // every box row, the single worst shuffle of the derivation at scale.
    val txsWithStruct0 = raw.toDF()
      .select(
        col("header.id").as("blockId"),
        col("header.height").as("height"),
        col("header.timestamp").as("timestamp"),
        size(col("transactions.transactions")).as("ntx"),
        transform(col("transactions.transactions"), t => size(t.getField("outputs")))
          .as("outSizes"),
        posexplode(col("transactions.transactions")).as(Seq("txIndex", "tx")))
      .select(
        col("blockId"), col("height"), col("timestamp"),
        col("tx.id").as("txId"),
        col("txIndex"),
        (col("txIndex") === col("ntx") - 1).as("coinbase"), // P2
        col("tx.size").as("txSize"),
        // boxes emitted by this block's EARLIER txs — the in-block base of
        // this tx's output global indexes (O(ntx²) adds per block; ntx is
        // bounded by block size, a few hundred)
        aggregate(slice(col("outSizes"), lit(1), col("txIndex")), lit(0L),
          (acc, n) => acc + n).as("txBoxPrefix"),
        try_element_at(col("tx.inputs"), lit(1)).getField("boxId").as("firstInputBoxId"), // P10 key; null for coinbase
        col("tx.inputs").as("rawInputs"),
        col("tx.dataInputs").as("rawDataInputs"),
        col("tx.outputs").as("rawOutputs"))
    val txsWithStruct = pin(txsWithStruct0)

    // P1 level 2: tx → outputs with positional index; P6 hash + template;
    // P11 register pivot r4..r9.
    val outputs0 = txsWithStruct
      .select(col("blockId"), col("height"), col("txId"), col("txIndex"),
        col("coinbase"), col("firstInputBoxId"), col("txBoxPrefix"),
        posexplode(col("rawOutputs")).as(Seq("outIndex", "o")))
      .select(
        col("o.boxId").as("boxId"),
        col("txId"), col("blockId"),
        col("o.creationHeight").as("creationHeight"),
        col("height").as("settlementHeight"),
        col("o.value").as("ergValue"),
        col("outIndex").as("index"),
        col("txIndex"), col("coinbase"), col("firstInputBoxId"), col("txBoxPrefix"),
        col("o.ergoTree").as("ergoTree"),
        col("o.assets").as("rawAssets"),
        col("o.additionalRegisters").as("rawRegisters"),
        element_at(col("o.additionalRegisters"), "R4").as("r4"),
        element_at(col("o.additionalRegisters"), "R5").as("r5"),
        element_at(col("o.additionalRegisters"), "R6").as("r6"),
        element_at(col("o.additionalRegisters"), "R7").as("r7"),
        element_at(col("o.additionalRegisters"), "R8").as("r8"),
        element_at(col("o.additionalRegisters"), "R9").as("r9"))
      .withColumn("ergoTreeHash", sha256OfHex(col("ergoTree")))
      .withColumn("ergoTreeT8Hex", templateHexUdf(col("ergoTree")))
      .withColumn("ergoTreeT8Hash",
        when(col("ergoTreeT8Hex").isNotNull, lower(sha2(unhex(col("ergoTreeT8Hex")), 256))))
    val outputs = pin(outputs0)

    val inputs = txsWithStruct
      .select(col("blockId"), col("height"), col("txId"), col("txIndex"),
        posexplode(col("rawInputs")).as(Seq("index", "i")))
      .select(col("i.boxId").as("boxId"), col("txId"), col("blockId"),
        col("height"), col("txIndex"), col("index"))

    // Read-only context references (FullBlockModel.scala:52-58): same flatten
    // shape as inputs, separate entity — they do NOT spend the box.
    val dataInputs = txsWithStruct
      .select(col("blockId"), col("height"), col("txId"), col("txIndex"),
        posexplode(col("rawDataInputs")).as(Seq("index", "d")))
      .select(col("d.boxId").as("boxId"), col("txId"), col("blockId"),
        col("height"), col("txIndex"), col("index"))

    // One row per (box, register) with the sigma decode (FullBlockModel
    // .scala:44-50, schema-tables.cql:88-96): raw hex + rendered type/value.
    val registers = outputs
      .select(col("boxId"), col("txId"), col("blockId"),
        col("settlementHeight").as("height"),
        explode(col("rawRegisters")).as(Seq("registerId", "rawValue")))
      .withColumn("parsed", RegisterParser.parseUdf(col("rawValue")))
      .select(col("boxId"), col("txId"), col("blockId"), col("height"),
        col("registerId"), col("rawValue"),
        col("parsed.sigmaType").as("sigmaType"),
        col("parsed.rendered").as("renderedValue"))

    // P10: token minted iff tokenId == first input boxId of its tx;
    // P9: EIP-004 props from r4/r5/r6 only for minted tokens.
    val assets = outputs
      .select(col("boxId"), col("txId"), col("blockId"),
        col("settlementHeight").as("height"),
        col("firstInputBoxId"), col("r4"), col("r5"), col("r6"),
        posexplode(col("rawAssets")).as(Seq("index", "a")))
      .select(
        col("a.tokenId").as("tokenId"),
        col("boxId"), col("txId"), col("blockId"), col("height"), col("index"),
        col("a.amount").as("amount"),
        (col("a.tokenId") === col("firstInputBoxId")).as("minted"),
        // P8/P9: EIP-004 props via the sigma register parser
        when(col("a.tokenId") === col("firstInputBoxId"),
          RegisterParser.renderUtf8Udf(col("r4"))).as("tokenName"),
        when(col("a.tokenId") === col("firstInputBoxId"),
          RegisterParser.renderUtf8Udf(col("r5"))).as("tokenDescription"),
        when(col("a.tokenId") === col("firstInputBoxId"),
          RegisterParser.renderLongUdf(col("r6")).cast("int")).as("tokenDecimals"))

    // Script dims with P7 address rendering (first block that saw the tree).
    val (ergoTrees, ergoTreeT8s) = scriptDims(outputs)

    // Token dim (LightBlockModel.scala:176-183, h2-schema.sql:63-77): one
    // row per minted token with its EIP-004 props and issuing box.
    val tokens = assets
      .filter(col("minted"))
      .select(
        col("tokenId"),
        col("boxId").as("issuingBoxId"),
        col("txId").as("issuingTxId"),
        col("height").as("issuingHeight"),
        col("amount").as("emissionAmount"),
        col("tokenName"), col("tokenDescription"), col("tokenDecimals"))

    // A1/A2: per-block sums as NESTED ARRAY FOLDS over the raw rows — one
    // raw block row already holds its whole tx/output tree, so the fee
    // filter (P3) and economics reduce per-row with ZERO shuffle. The
    // groupBy-the-exploded-boxes alternative shuffles the entire box table
    // (billions of rows at chain scale) just to rebuild what each raw row
    // knew locally; these folds keep block economics map-side forever.
    // Null discipline matches the old sum() semantics (nulls contribute 0).
    def nestedSum(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      aggregate(col("transactions.transactions"), lit(0L),
        (acc, t) => acc + coalesce(f(t), lit(0L)))
    def outputSum(of: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      nestedSum(t => aggregate(t.getField("outputs"), lit(0L),
        (acc, o) => acc + coalesce(of(o), lit(0L))))
    val econTerm = (o: org.apache.spark.sql.Column) =>
      if (protocolTrees.isEmpty) o.getField("value")
      else when(o.getField("ergoTree").isin(protocolTrees: _*), lit(0L))
        .otherwise(o.getField("value"))

    // Full header surface (reference keeps all 16 — db/FullBlockModel
    // .scala; round 1 dropped 10 of them) + the folded economics.
    val headers = raw.toDF().select(
      col("header.id").as("blockId"),
      col("header.parentId").as("parentId"),
      col("header.height").as("height"),
      col("header.timestamp").as("timestamp"),
      col("size").as("blockSize"),
      col("header.minerPk").as("minerPk"),
      col("header.version").as("version"),
      col("header.nBits").as("nBits"),
      col("header.difficulty").as("difficulty"),
      col("header.stateRoot").as("stateRoot"),
      col("header.adProofsRoot").as("adProofsRoot"),
      col("header.transactionsRoot").as("transactionsRoot"),
      col("header.extensionHash").as("extensionHash"),
      col("header.w").as("powW"),
      col("header.n").as("powN"),
      col("header.d").as("powD"),
      col("header.votes").as("votes"),
      outputSum(econTerm).as("sumOutputValue"),
      outputSum(o => when(o.getField("ergoTree") === feeTree,
        o.getField("value")).otherwise(0L)).as("blockFee"),
      nestedSum(t => size(t.getField("outputs")).cast("long")).as("boxCount"),
      size(col("transactions.transactions")).cast("long").as("txsCount"),
      nestedSum(t => t.getField("size")).as("txsSize"))

    // A3/A5: cumulative stats as TWO-PHASE prefix sums — every window below
    // is partitioned by height bucket (parallel across ~height/10⁴ buckets),
    // and cross-bucket carry comes from exclusive bucket offsets computed on
    // the tiny bucket-totals table. No single-partition WindowExec anywhere,
    // so cumulative derivation scales with executors instead of serializing
    // the whole chain through one task.
    val joined = headers
      .withColumn("minerReward", ChainConst.minerRewardAt(col("height")))
      .withColumn("minerRevenue", col("minerReward") + col("blockFee"))
      .withColumn("blockCoins", col("sumOutputValue") - col("minerRevenue"))
      .withColumn("minerAddress", minerAddressUdf(col("minerPk")))
      .withColumn("hb", floor(col("height") / ChainConst.HeightBucketSize).cast("long"))

    val wIn = Window.partitionBy("hb").orderBy("height")
    val wInCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // lag(timestamp) across a bucket boundary = the previous bucket's
    // highest-height timestamp (max_by, NOT max — real-chain timestamps are
    // not monotonic), joined in as a tiny broadcast dim.
    val prevBucketTs = joined.groupBy("hb")
      .agg(max_by(col("timestamp"), col("height")).as("prevBucketTs"))
      .select((col("hb") + 1).as("hb"), col("prevBucketTs"))
    val withMt = joined
      .join(broadcast(prevBucketTs), Seq("hb"), "left_outer")
      .withColumn("blockMiningTime",
        col("timestamp") -
          coalesce(lag("timestamp", 1).over(wIn), col("prevBucketTs"), col("timestamp")))

    // Phase 1: per-bucket totals. Phase 2: exclusive offsets via a
    // triangular join on the bucket table (~100 rows at mainnet scale).
    val totals = withMt.groupBy("hb").agg(
      sum("blockSize").as("tSize"), sum("txsCount").as("tTxs"),
      sum("blockMiningTime").as("tMt"), sum("blockFee").as("tFees"),
      sum("minerReward").as("tRew"), sum("blockCoins").as("tCoins"),
      sum("boxCount").as("tBoxes"))
    val offsets = totals.as("x")
      .join(totals.as("y"), col("y.hb") < col("x.hb"), "left_outer")
      .groupBy(col("x.hb").as("hb"))
      .agg(
        coalesce(sum("y.tSize"), lit(0L)).as("oSize"),
        coalesce(sum("y.tTxs"), lit(0L)).as("oTxs"),
        coalesce(sum("y.tMt"), lit(0L)).as("oMt"),
        coalesce(sum("y.tFees"), lit(0L)).as("oFees"),
        coalesce(sum("y.tRew"), lit(0L)).as("oRew"),
        coalesce(sum("y.tCoins"), lit(0L)).as("oCoins"),
        coalesce(sum("y.tBoxes"), lit(0L)).as("oBoxes"))

    val blocks = pin(withMt
      .join(broadcast(offsets), "hb")
      .withColumn("blockChainTotalSize", col("oSize") + sum("blockSize").over(wInCum))
      .withColumn("totalTxsCount", col("oTxs") + sum("txsCount").over(wInCum))
      .withColumn("totalCoinsIssued", ChainConst.issuedCoinsAt(col("height")))
      .withColumn("totalMiningTime", col("oMt") + sum("blockMiningTime").over(wInCum))
      .withColumn("totalFees", col("oFees") + sum("blockFee").over(wInCum))
      .withColumn("totalMinersReward", col("oRew") + sum("minerReward").over(wInCum))
      .withColumn("totalCoinsInTxs", col("oCoins") + sum("blockCoins").over(wInCum))
      .withColumn("maxTxGix", col("oTxs") + sum("txsCount").over(wInCum) - 1)
      .withColumn("maxBoxGix", col("oBoxes") + sum("boxCount").over(wInCum) - 1)
      .drop("sumOutputValue", "prevBucketTs",
        "oSize", "oTxs", "oMt", "oFees", "oRew", "oCoins", "oBoxes"))

    // A5: global indexes = block-level base + in-block position. The bases
    // come from a NARROW standalone two-phase plan — NOT from the blocks
    // table — so the txs/outputs subtrees don't drag the full
    // headers/economics/cumulative-window DAG in behind an unprunable inner
    // join. Per-block counts are the same shuffle-free array folds as the
    // economics above (the old groupBy over the tx flatten shuffled every
    // tx row to rebuild per-raw-row local knowledge). Values are identical
    // to the blocks table's window-derived maxTxGix/maxBoxGix by
    // construction (same bucketed prefix-sum over the same counts).
    val perBlockIdx = raw.toDF()
      .select(
        col("header.id").as("blockId"),
        col("header.height").as("height"),
        size(col("transactions.transactions")).cast("long").as("bTxs"),
        nestedSum(t => size(t.getField("outputs")).cast("long")).as("bBoxes"))
      .withColumn("hb", floor(col("height") / ChainConst.HeightBucketSize).cast("long"))
    val idxTotals = perBlockIdx.groupBy("hb")
      .agg(sum("bTxs").as("tTxs"), sum("bBoxes").as("tBoxes"))
    val idxOffsets = idxTotals.as("x")
      .join(idxTotals.as("y"), col("y.hb") < col("x.hb"), "left_outer")
      .groupBy(col("x.hb").as("hb"))
      .agg(coalesce(sum("y.tTxs"), lit(0L)).as("oTxs"),
        coalesce(sum("y.tBoxes"), lit(0L)).as("oBoxes"))
    val wIdxPrev = Window.partitionBy("hb").orderBy("height")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gixKeys = perBlockIdx
      .join(broadcast(idxOffsets), "hb")
      .select(col("blockId"),
        (col("oTxs") + coalesce(sum("bTxs").over(wIdxPrev), lit(0L))).as("txGixBase"),
        (col("oBoxes") + coalesce(sum("bBoxes").over(wIdxPrev), lit(0L))).as("boxGixBase"))
    val txs = txsWithStruct
      .join(gixKeys, "blockId")
      .withColumn("globalIndex", col("txGixBase") + col("txIndex"))
      .select("txId", "blockId", "height", "timestamp", "txIndex", "coinbase",
        "txSize", "globalIndex")
    // in-block position = per-tx prefix (computed pre-explode, no shuffle)
    // + positional index; the gix join is one-row-per-block narrow and
    // AQE-broadcastable, so outputs are never shuffled for their index.
    val outputsWithGix = outputs
      .drop("rawAssets", "rawRegisters", "firstInputBoxId")
      .join(gixKeys.select("blockId", "boxGixBase"), "blockId")
      .withColumn("globalIndex", col("boxGixBase") + col("txBoxPrefix") + col("index"))
      .drop("boxGixBase", "txBoxPrefix")

    ChainTables(
      blocks = blocks.drop("hb"),
      txs = txs,
      outputs = outputsWithGix,
      inputs = inputs,
      assets = assets,
      ergoTrees = ergoTrees,
      ergoTreeT8s = ergoTreeT8s,
      dataInputs = dataInputs,
      registers = registers,
      tokens = tokens)
  }
}
