package graft.chain

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Block sources (SURVEY.md §2.1 S2/S3): JSON-lines block files (gzip or
  * plain — Spark's text/json sources decompress by codec extension
  * automatically, like the reference's gunzip source BlockReader.scala:26-40)
  * decoded against the explicit RawBlock schema — no inference in production
  * (§1.1) — with the height offset pushed into the scan.
  */
object BlockSource {

  val schema = Encoders.product[RawBlock].schema

  /** S3: batch backfill from block line files; `fromHeight` prunes at the
    * source (the `dropUntil` analog, predicate-pushed).
    */
  def fromJsonLines(spark: SparkSession, path: String, fromHeight: Int = 0): Dataset[RawBlock] = {
    import spark.implicits._
    spark.read.schema(schema).json(path)
      .filter(col("header.height") >= fromHeight)
      .as[RawBlock]
  }

  /** S1/S4-adjacent helper: write a block set as JSON lines (test fixtures
    * and the hand-off format from any out-of-engine fetcher — the node HTTP
    * pool stays outside the engine, §2.9 ST8).
    */
  def writeJsonLines(blocks: Dataset[RawBlock], path: String): Unit =
    blocks.toJSON.write.mode("overwrite").text(path)

  val nodeSchema = Encoders.product[NodeBlock].schema

  /** S2 against the REAL node-API JSON shape (`blockTransactions` wrapper,
    * nested `powSolutions`, quoted decimal difficulty, ~65-digit numeric
    * `d` — reference Codecs.scala:1-133): explicit-schema decode into the
    * node model, then a typed map into [[RawBlock]]. A reference user can
    * point this at the node's own block dumps unchanged.
    */
  def fromNodeJsonLines(spark: SparkSession, path: String, fromHeight: Int = 0): Dataset[RawBlock] = {
    import spark.implicits._
    // PERMISSIVE parse yields all-null rows for corrupt lines (a truncated
    // dump, a stray log line) and null FIELDS for well-formed JSON of the
    // wrong shape (a headers-endpoint line mixed into a blocks dump): guard
    // every block-level field the typed deserializer/toRaw requires, so bad
    // lines drop instead of aborting the read.
    spark.read.schema(nodeSchema).json(path)
      .filter(col("header.id").isNotNull && col("header.timestamp").isNotNull &&
        col("header.nBits").isNotNull && col("header.version").isNotNull &&
        col("header.difficulty").isNotNull && col("header.powSolutions").isNotNull &&
        col("blockTransactions").isNotNull &&
        col("blockTransactions.transactions").isNotNull &&
        col("header.height") >= fromHeight)
      .as[NodeBlock]
      .map(NodeBlock.toRaw)
  }
}

// --- the node-API wire model (NodeModel.scala:9-96 analog), decoded with an
// --- explicit schema; unknown JSON fields are ignored by the reader.

case class NodePow(pk: String, w: String, n: String, d: Option[String])

case class NodeHeader(
  id: String, parentId: String, version: Int, height: Int, nBits: Long,
  difficulty: String, timestamp: Long, stateRoot: String, adProofsRoot: String,
  transactionsRoot: String, extensionHash: String, powSolutions: NodePow,
  votes: String)

/** `extension` is the input's context-extension map (varId → serialized
  * sigma value hex) — real dApp/oracle txs carry non-empty ones, and the
  * reference persists them as arbitrary JSON (Codecs.scala
  * apiSpendingProofDecoder, FullBlockBuilder.scala:97).
  */
case class NodeProof(proofBytes: Option[String],
  extension: Option[Map[String, String]])
case class NodeInput(boxId: String, spendingProof: Option[NodeProof])
case class NodeDataInput(boxId: String)
case class NodeAsset(tokenId: String, amount: Long)

case class NodeOutput(
  boxId: String, value: Long, creationHeight: Int, ergoTree: String,
  assets: Option[Seq[NodeAsset]], additionalRegisters: Option[Map[String, String]],
  index: Int)

case class NodeTx(
  id: String, inputs: Seq[NodeInput], dataInputs: Option[Seq[NodeDataInput]],
  outputs: Seq[NodeOutput], size: Option[Int])

case class NodeTxs(headerId: String, transactions: Seq[NodeTx])

/** extension.fields is a list of [key, value] hex pairs on the wire. */
case class NodeExtension(headerId: Option[String], digest: Option[String],
  fields: Option[Seq[Seq[String]]])

case class NodeAdProofs(headerId: Option[String], proofBytes: Option[String],
  digest: Option[String])

case class NodeBlock(
  header: NodeHeader,
  blockTransactions: NodeTxs,
  extension: Option[NodeExtension],
  adProofs: Option[NodeAdProofs],
  size: Option[Int])

object NodeBlock {
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'           => "\\\""
    case '\\'          => "\\\\"
    case c if c < ' '  => "\\u%04x".format(c.toInt)
    case c             => c.toString
  }

  private def jsonObj(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s""""${jsonEscape(k)}":"${jsonEscape(v)}"""" }
      .mkString("{", ",", "}")

  /** Render the extension field pairs back to the JSON-object passthrough
    * form the engine carries (§2.8 JSON passthrough). Wire data is hex, but
    * nothing enforces that — escape instead of trusting the shape; entries
    * that are not [key, value] pairs are kept faithfully as a JSON array
    * rather than silently dropped.
    */
  private def fieldsJson(fields: Seq[Seq[String]]): String =
    if (fields.forall(_.length == 2))
      jsonObj(fields.map { case Seq(k, v) => (k, v) })
    else
      fields.map(_.map(e => s""""${jsonEscape(e)}"""").mkString("[", ",", "]"))
        .mkString("[", ",", "]")

  /** Shared by block decode and the mempool path (the node serves the same
    * tx shape confirmed and unconfirmed — NodeModel.scala:77-83).
    */
  def toRawTx(tx: NodeTx): RawTx = RawTx(tx.id,
    tx.inputs.map(i => RawInput(i.boxId,
      i.spendingProof.map(p => SpendingProof(p.proofBytes,
        // deterministic key order; (length, lexical) sorts the numeric
        // varIds the node emits ("2" < "10") without parsing them
        jsonObj(p.extension.getOrElse(Map.empty).toSeq
          .sortBy(kv => (kv._1.length, kv._1))))))),
    tx.dataInputs.getOrElse(Nil).map(d => RawDataInput(d.boxId)),
    tx.outputs.map(o => RawOutput(o.boxId, o.value, o.creationHeight,
      o.ergoTree, o.assets.getOrElse(Nil).map(a => RawAsset(a.tokenId, a.amount)),
      o.additionalRegisters.getOrElse(Map.empty))),
    tx.size)

  def toRaw(nb: NodeBlock): RawBlock = {
    val h = nb.header
    RawBlock(
      RawHeader(h.id, h.parentId, h.version.toByte, h.height, h.nBits,
        new java.math.BigDecimal(h.difficulty), h.timestamp, h.stateRoot,
        h.adProofsRoot, h.transactionsRoot, h.extensionHash,
        h.powSolutions.pk, h.powSolutions.w, h.powSolutions.n,
        h.powSolutions.d.getOrElse("0"), h.votes),
      RawTransactions(nb.blockTransactions.headerId,
        nb.blockTransactions.transactions.map(toRawTx)),
      RawExtension(nb.extension.flatMap(_.headerId).getOrElse(h.id),
        nb.extension.flatMap(_.digest).getOrElse(""),
        fieldsJson(nb.extension.flatMap(_.fields).getOrElse(Nil))),
      nb.adProofs.map(a => RawAdProofs(a.headerId.getOrElse(h.id),
        a.proofBytes.getOrElse(""), a.digest.getOrElse(""))),
      nb.size.getOrElse(0))
  }
}
