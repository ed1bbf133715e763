package graft.chain

import graft.Lineage.LineageCut

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The UTXO state + box-query surface (SURVEY.md §2.4 J1–J6, §2.5 A6–A7,
  * §2.6–2.7, §3.1): the reference's 45 REST endpoints collapse to a handful
  * of parameterized DataFrame builders.
  *
  * Scale notes: `utxos`/`spentBoxes` are one anti/semi join on `boxId` — a
  * uniform 64-hex key, so the shuffle is skew-free; AQE handles residual
  * imbalance. The *address*-keyed aggregations (top-K) are where the chain's
  * real skew lives (one script can hold millions of boxes — readme.md:12-16
  * "supernode problem"); they are expressed as partial-agg-friendly
  * `groupBy.agg` (map-side combine collapses per-partition duplicates
  * before the shuffle, the two-phase equivalent of the reference's
  * supernode maps) followed by `orderBy+limit` (TakeOrderedAndProject).
  */
object UtxoQueries {

  /** J5: unspent = outputs ∖ inputs (the project's core trick —
    * BoxService.scala:132-138, MvStorage.removeInputBoxes*), with the
    * protocol-box blacklist (P14, PersistentRepo.scala:29-31).
    */
  def utxos(t: ChainTables, blacklist: Seq[String] = Nil): DataFrame = {
    val base = t.outputs.join(t.inputs.select("boxId"), Seq("boxId"), "left_anti")
    if (blacklist.isEmpty) base else base.filter(!col("boxId").isin(blacklist: _*))
  }

  /** E1: spent = outputs ∩ inputs. */
  def spentBoxes(t: ChainTables): DataFrame =
    t.outputs.join(t.inputs.select("boxId"), Seq("boxId"), "left_semi")

  /** J6: input enrichment — resolve each input's value/script from the box
    * it spends (MvStorage.removeInputBoxesByErgoTree:132-147).
    */
  def resolvedInputs(t: ChainTables): DataFrame =
    t.inputs.join(
      t.outputs.select(col("boxId"), col("ergValue"), col("ergoTreeHash")),
      Seq("boxId"))

  /** P12: whitelisted equality-filter pushdown surface
    * (BoxService.scala:370-371) — a fold of `.filter` so every predicate
    * reaches the parquet scan.
    */
  def withIndexFilters(df: DataFrame, filters: Map[String, Any]): DataFrame =
    filters.foldLeft(df) { case (d, (k, v)) => d.filter(col(k) === lit(v)) }

  sealed trait BoxMode
  case object Unspent extends BoxMode
  case object Spent extends BoxMode
  case object Any extends BoxMode

  private def boxesFor(t: ChainTables, mode: BoxMode): DataFrame = mode match {
    case Unspent => utxos(t)
    case Spent   => spentBoxes(t)
    case Any     => t.outputs
  }

  /** The {unspent|spent|any} × by-{ergoTreeHash|t8Hash|address|tokenId}
    * query matrix (§3.1). `byAddress` inverts address → script hash with a
    * broadcast dim join (the reference uses a codec, P7 — a join keeps the
    * inverse consistent with however addresses were rendered).
    */
  def boxesByErgoTreeHash(t: ChainTables, mode: BoxMode, hash: String,
    filters: Map[String, Any] = Map.empty): DataFrame =
    withIndexFilters(boxesFor(t, mode).filter(col("ergoTreeHash") === hash), filters)

  def boxesByErgoTreeT8Hash(t: ChainTables, mode: BoxMode, t8Hash: String,
    filters: Map[String, Any] = Map.empty): DataFrame =
    withIndexFilters(boxesFor(t, mode).filter(col("ergoTreeT8Hash") === t8Hash), filters)

  def boxesByAddress(t: ChainTables, mode: BoxMode, address: String,
    filters: Map[String, Any] = Map.empty): DataFrame = {
    val hash = broadcast(
      t.ergoTrees.filter(col("address") === address).select(col("hash")))
    withIndexFilters(
      boxesFor(t, mode).join(hash, col("ergoTreeHash") === col("hash"), "left_semi"),
      filters)
  }

  /** J3: boxes holding a token (PersistentBoxRepo.lookupUtxoIdsByTokenId). */
  def boxesByTokenId(t: ChainTables, mode: BoxMode, tokenId: String): DataFrame =
    boxesFor(t, mode).join(
      t.assets.filter(col("tokenId") === tokenId).select("boxId"),
      Seq("boxId"), "left_semi")

  /** Point lookups by id(s) — isin for small sets pushes into the scan. */
  def boxesByIds(t: ChainTables, mode: BoxMode, boxIds: Seq[String]): DataFrame =
    boxesFor(t, mode).filter(col("boxId").isin(boxIds: _*))

  /** `numConfirmations(bestHeight)` derived column (FullBlockModel.scala:118). */
  def withConfirmations(boxes: DataFrame, bestHeight: Int): DataFrame =
    boxes.withColumn("numConfirmations",
      lit(bestHeight) - col("settlementHeight") + 1)

  /** J1: box enriched with script hex and block metadata
    * (PersistentBoxRepo.joinUtxoWithErgoTreeAndBlock:72-86). NO broadcast
    * hints: both dims grow with the chain (one row per script with the full
    * hex — wide; one per block), so a forced broadcast is the same OOM
    * class the address-cluster label join had. AQE picks the right side at
    * runtime from actual sizes: a point query's few boxes broadcast against
    * the dims, a full-scan enrich degrades to a shuffle join instead of
    * blowing up the driver.
    */
  def enrichedBoxes(t: ChainTables, boxes: DataFrame): DataFrame =
    boxes
      .join(t.ergoTrees.select(col("hash"), col("hex"), col("address")),
        boxes("ergoTreeHash") === col("hash"))
      .drop("hash")
      .join(t.blocks.select(col("blockId"), col("height").as("blockHeight"),
        col("timestamp").as("blockTimestamp")), Seq("blockId"))

  // ---- stats (A6/A7/A11, O1–O4) ----

  def topAddressesByUtxoCount(t: ChainTables, limit: Int, minCount: Long = 1): DataFrame =
    utxos(t)
      .groupBy("ergoTreeHash")
      .agg(count(lit(1)).as("utxoCount"))
      .filter(col("utxoCount") >= minCount)
      .orderBy(desc("utxoCount"), asc("ergoTreeHash"))
      .limit(limit)

  def topAddressesByValue(t: ChainTables, limit: Int): DataFrame =
    utxos(t)
      .groupBy("ergoTreeHash")
      .agg(sum("ergValue").as("totalValue"))
      .orderBy(desc("totalValue"), asc("ergoTreeHash"))
      .limit(limit)

  /** A11: per-epoch roll-up (readme.md:174-183 counters). */
  def epochRollup(t: ChainTables): DataFrame =
    t.blocks
      .groupBy(floor(col("height") / ChainConst.StatsEpochLength).as("epoch"))
      .agg(count(lit(1)).as("nBlocks"), sum("txsCount").as("nTxs"),
        sum("blockFee").as("fees"), max("height").as("maxHeight"))
      .orderBy("epoch")

  /** O1: last-N blocks by height (PersistentBlockRepo.getLastBlocks). */
  def lastBlocks(t: ChainTables, n: Int): DataFrame =
    t.blocks.orderBy(desc("height")).limit(n)

  /** O4/E3: height-gap detection (MvStorage.findMissingHeights:284-290). */
  def missingHeights(t: ChainTables, upTo: Int): DataFrame = {
    val spark = t.blocks.sparkSession
    spark.range(1, upTo + 1).select(col("id").cast("int").as("height"))
      .join(t.blocks.select("height"), Seq("height"), "left_anti")
      .orderBy("height")
  }

  // ---- beyond-parity chain analytics (q74–q77, q81) ----

  /** Per-script balance ledger: credits at settlement height, debits at
    * spend height, running balance via a window PARTITIONED by script —
    * never global, so the plan scales with the address count.
    */
  def balanceHistory(t: ChainTables): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val credits = t.outputs.select(col("ergoTreeHash"),
      col("settlementHeight").as("height"), col("ergValue").as("delta"))
    val debits = t.inputs.select(col("boxId"), col("height"))
      .join(t.outputs.select("boxId", "ergoTreeHash", "ergValue"), "boxId")
      .select(col("ergoTreeHash"), col("height"), (-col("ergValue")).as("delta"))
    val w = Window.partitionBy("ergoTreeHash").orderBy("height")
    credits.unionByName(debits)
      .groupBy("ergoTreeHash", "height").agg(sum("delta").as("net"))
      .withColumn("balance", sum("net").over(w))
      .orderBy("ergoTreeHash", "height")
  }

  /** Point-in-time rich list: the UTXO set AS OF `height` (both anti-join
    * sides height-pruned so the scan reads only the history prefix).
    */
  def richListAt(t: ChainTables, height: Int, k: Int): DataFrame = {
    val spentByH = t.inputs.filter(col("height") <= height).select("boxId")
    t.outputs.filter(col("settlementHeight") <= height)
      .join(spentByH, Seq("boxId"), "left_anti")
      .groupBy("ergoTreeHash")
      .agg(sum("ergValue").as("balance"), count(lit(1)).as("nBoxes"))
      .orderBy(desc("balance"), asc("ergoTreeHash"))
      .limit(k)
  }

  /** Top-`k` holder scripts per token over the live UTXO set. */
  def tokenHolders(t: ChainTables, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val held = utxos(t).select(col("boxId"), col("ergoTreeHash"))
      .join(t.assets.select("boxId", "tokenId", "amount"), "boxId")
      .groupBy("tokenId", "ergoTreeHash")
      .agg(sum("amount").as("held"), count(lit(1)).as("nBoxes"))
    val w = Window.partitionBy("tokenId")
      .orderBy(desc("held"), asc("ergoTreeHash"))
    held.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("tokenId", "rnk")
  }

  /** Exact heavy-hitter scripts above frequency N/`k` via a k-counter
    * Misra–Gries sketch + broadcast recount (the SuperNodeCollector analog
    * with O(k) memory — no full groupBy over the key space ever happens).
    */
  def hotScripts(t: ChainTables, k: Int): DataFrame = {
    val s = t.outputs.sparkSession
    import s.implicits._
    val scripts = t.outputs.select(col("ergoTreeHash")).as[String]
    val sk = scripts
      .select(new graft.functions.FrequentItemsAggregator(k).toColumn)
      .toDF("sk")
    val cands = sk.select(explode(map_keys(col("sk"))).as("ergoTreeHash"))
    val total = t.outputs.agg(count(lit(1)).as("total"))
    t.outputs.join(broadcast(cands), Seq("ergoTreeHash"), "left_semi")
      .groupBy("ergoTreeHash").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * k > col("total"))
      .select(col("ergoTreeHash"), col("n"))
      .orderBy("ergoTreeHash")
  }

  /** Coin-blocks destroyed per epoch (the block-height analog of the
    * coin-days-destroyed velocity metric): every spend weighs its value by
    * the box's age at spend time. One resolution join on boxId (uniform
    * key) + one keyed aggregation — linear at any chain size.
    */
  def coinBlocksDestroyed(t: ChainTables,
    epochLen: Int = ChainConst.StatsEpochLength): DataFrame =
    t.inputs.select(col("boxId"), col("height").as("spendHeight"))
      .join(t.outputs.select(col("boxId"), col("ergValue"),
        col("settlementHeight")), "boxId")
      .withColumn("age", col("spendHeight") - col("settlementHeight"))
      .groupBy(floor(col("spendHeight") / epochLen).as("epoch"))
      .agg(count(lit(1)).as("nSpends"),
        sum(col("ergValue") * col("age")).as("coinBlocksDestroyed"),
        max("age").as("maxAge"))
      .orderBy("epoch")

  /** Live-UTXO age distribution at the chain tip: boxes bucketed by age in
    * `bucketLen`-block ranges with value totals — the "HODL wave" query.
    * The tip is a 1-row broadcast; everything else is the standard UTXO
    * anti-join + one aggregation.
    */
  def utxoAgeDistribution(t: ChainTables, bucketLen: Int = 16): DataFrame = {
    val tip = t.blocks.agg(max("height").as("tipHeight"))
    utxos(t)
      .crossJoin(broadcast(tip))
      .withColumn("age", col("tipHeight") - col("settlementHeight"))
      .groupBy(floor(col("age") / bucketLen).as("ageBucket"))
      .agg(count(lit(1)).as("nBoxes"), sum("ergValue").as("totalValue"))
      .orderBy("ageBucket")
  }

  /** Common-input-ownership address clustering: star edges per tx (linear
    * in Σ inputs) + min-label propagation over the co-spend subgraph only;
    * scripts never co-spent are singletons and rejoin after convergence.
    */
  def addressClusters(t: ChainTables): DataFrame = {
    val inScripts = t.inputs.select("boxId", "txId")
      .join(t.outputs.select("boxId", "ergoTreeHash"), "boxId")
      .select("txId", "ergoTreeHash").distinct()
    val txMin = inScripts.groupBy("txId").agg(min("ergoTreeHash").as("m"))
    val star = inScripts.join(txMin, "txId")
      .filter(col("ergoTreeHash") =!= col("m"))
      .select(col("ergoTreeHash").as("a"), col("m").as("b")).distinct()
      .cutLineage()
    val edges = star.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(star.select(col("b").as("src"), col("a").as("dst")))
    val labels = graft.functions.Clustering.minLabelComponents(edges)
    // no broadcast hint: on a real chain most scripts are eventually
    // co-spent, so the label table scales with the address count — let the
    // planner choose (AQE broadcasts it anyway when it is actually small)
    val all = t.outputs.select(col("ergoTreeHash")).distinct()
      .join(labels.toDF("node", "cid"),
        col("ergoTreeHash") === col("node"), "left")
      .select(col("ergoTreeHash"),
        coalesce(col("cid"), col("ergoTreeHash")).as("cluster_id"))
    val sizes = all.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    all.join(sizes, "cluster_id")
      .select("ergoTreeHash", "cluster_id", "csize")
      .orderBy("ergoTreeHash")
  }
}
