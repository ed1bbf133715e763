package graft.chain

/** Ingest-shaped model of a full block (reference `NodeModel.scala:35-83`),
  * simplified to the fields the derivation pipeline consumes. One nested row
  * per block; `explode`/`posexplode` turns it into the entity tables
  * (SURVEY.md §1.3).
  *
  * Register values are carried as a `Map[String, String]` of raw hex exactly
  * like the reference's `additionalRegisters` (NodeModel.scala:62-69); the
  * r4..r9 pivot happens in the derivation (OutputBuilder.scala:63-68).
  */
case class RawAsset(tokenId: String, amount: Long)

case class RawOutput(
  boxId: String,
  value: Long,
  ergoTree: String,
  creationHeight: Int,
  assets: Seq[RawAsset],
  registers: Map[String, String])

case class RawInput(boxId: String)

case class RawTx(
  id: String,
  inputs: Seq[RawInput],
  outputs: Seq[RawOutput],
  size: Int)

case class RawHeader(
  id: String,
  parentId: String,
  height: Int,
  timestamp: Long,
  version: Byte,
  minerPk: String)

case class RawBlock(
  header: RawHeader,
  transactions: Seq[RawTx],
  size: Int)
