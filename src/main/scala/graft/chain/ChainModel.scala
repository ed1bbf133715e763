package graft.chain

/** Ingest model of a full block in the canonical node-JSON shape
  * (FIXTURES.md §1, mirroring reference `NodeModel.scala:9-96`): one nested
  * row per block; `explode`/`posexplode` turns it into the entity tables
  * (SURVEY.md §1.3). The explicit `Encoders.product[RawBlock]` schema is the
  * production JSON-decode contract — no inference (§1.1).
  *
  * Register values are raw serialized-sigma hex in `additionalRegisters`
  * exactly like the node API (NodeModel.scala:62-69); the r4..r9 pivot and
  * sigma decoding happen in the derivation (P8/P11).
  */
case class RawAsset(tokenId: String, amount: Long)

case class SpendingProof(proofBytes: Option[String], extension: String)

case class RawInput(
  boxId: String,
  spendingProof: Option[SpendingProof] = None)

case class RawDataInput(boxId: String)

case class RawOutput(
  boxId: String,
  value: Long,
  creationHeight: Int,
  ergoTree: String,
  assets: Seq[RawAsset],
  additionalRegisters: Map[String, String])

case class RawTx(
  id: String,
  inputs: Seq[RawInput],
  dataInputs: Seq[RawDataInput],
  outputs: Seq[RawOutput],
  size: Option[Int])

/** The node API wraps the tx list with its header id (NodeModel.scala:26-29). */
case class RawTransactions(headerId: String, transactions: Seq[RawTx])

case class RawHeader(
  id: String,
  parentId: String,
  version: Byte,
  height: Int,
  nBits: Long,
  difficulty: java.math.BigDecimal,
  timestamp: Long,
  stateRoot: String,
  adProofsRoot: String,
  transactionsRoot: String,
  extensionHash: String,
  minerPk: String,
  w: String,
  n: String,
  // PoW distance — arbitrary-precision decimal rendered as a string: real
  // mainnet d values run to ~65 digits, past DecimalType(38)'s capacity
  // (the reference's Cassandra DECIMAL is arbitrary-precision too,
  // schema-tables.cql:9).
  d: String,
  votes: String)

case class RawExtension(headerId: String, digest: String, fields: String)

case class RawAdProofs(headerId: String, proofBytes: String, digest: String)

case class RawBlock(
  header: RawHeader,
  transactions: RawTransactions,
  extension: RawExtension,
  adProofs: Option[RawAdProofs],
  size: Int)
