package graft.chain

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import scala.collection.mutable

/** Deterministic synthetic chain generator for tests/demos (the analog of
  * the reference's canned-block fixtures, StreamSchedulerSpec.scala:24-85 —
  * which are real-chain data we must not copy). Pure function of its
  * parameters: no RNG, ids are sha256 of structured labels.
  *
  * Economics are constructed to satisfy the invariants the derivation
  * pipeline is tested against: every non-coinbase tx conserves value
  * (Σinputs = Σoutputs incl. its fee output), the coinbase (LAST tx of the
  * block, FullBlockBuilder.scala:86-87) mints exactly
  * minerReward(h) + blockFee(h), and token mints follow the
  * tokenId == first-input-boxId rule (OutputBuilder.scala:21-51).
  */
object ChainFixture {

  val GenesisParentId: String = "0" * 64
  val TxFee: Long = 1000000L

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Registers use the real sigma primitive encodings (RegisterParser). */
  private def collHex(s: String): String = RegisterParser.encodeUtf8(s)

  /** The fixture's fee-contract script (FeeContract.ergoTreeHex analog). */
  val FeeTree: String = md5Hex("fee-contract")

  /** Script universe: every third script is a P2PK-style tree (leading
    * marker `0008cd`, not constant-segregated ⇒ no template —
    * ErgoTreeParser.isErgoTreeT8:25-28); the rest are REAL segregated trees
    * (header 0x10, one SInt constant `k`, then expression bytes) so the
    * production tree walker extracts a template shared by k%4.
    */
  def script(k: Int): String =
    if (k % 3 == 0) "0008cd" + md5Hex(s"pk:$k")
    else "1001" + RegisterParser.encodeInt(k) + md5Hex(s"tmpl:${k % 4}")

  def minerScript(h: Int): String = "0008cd" + md5Hex(s"minerpk:${h % 5}")

  /** Generate `nBlocks` of a single main chain starting at height 1. */
  def generate(nBlocks: Int): Seq[RawBlock] = generateBranch(1, nBlocks, GenesisParentId, "", initialSpendable = Nil)._1

  /** Generate a chain of `mainLen` blocks plus two competing branches forking
    * after `forkAt`: branch "a" of length `shortLen` and branch "b" of length
    * `longLen`. Returns (all blocks incl. both branches, ids of branch b —
    * the expected winner when longLen > shortLen).
    */
  def generateWithFork(forkAt: Int, shortLen: Int, longLen: Int): (Seq[RawBlock], Seq[String]) = {
    val (trunk, spendable) = generateBranch(1, forkAt, GenesisParentId, "", Nil)
    val forkParent = trunk.last.header.id
    val (branchA, _) = generateBranch(forkAt + 1, forkAt + shortLen, forkParent, "a", spendable)
    val (branchB, _) = generateBranch(forkAt + 1, forkAt + longLen, forkParent, "b", spendable)
    (trunk ++ branchA ++ branchB, branchB.map(_.header.id))
  }

  /** One branch of blocks [fromH, toH]; `salt` differentiates fork branches
    * (distinct block/tx/box ids, same heights). Returns the blocks and the
    * remaining spendable set (for chaining fork branches off a trunk).
    */
  private def generateBranch(
    fromH: Int,
    toH: Int,
    parent0: String,
    salt: String,
    initialSpendable: Seq[(String, Long)]): (Seq[RawBlock], Seq[(String, Long)]) = {

    val spendable = mutable.Queue[(String, Long)](initialSpendable: _*)
    val blocks = Vector.newBuilder[RawBlock]
    var parent = parent0

    for (h <- fromH to toH) {
      val nUser = math.min(spendable.size / 2, h % 3)
      val userTxs = (0 until nUser).map { i =>
        val (b1, v1) = spendable.dequeue()
        val (b2, v2) = spendable.dequeue()
        val spendTotal = v1 + v2 - TxFee
        val o1v = spendTotal * 2 / 3
        val o2v = spendTotal - o1v
        val mint = (h + i) % 4 == 0
        // register menu per FIXTURES.md §1: SInt/SLong/Coll[SByte] decode;
        // R7 is a well-formed ProveDlog sigma prop (renders as the 33-byte
        // point hex), R9 alternates between a valid (Coll[SByte],Coll[SByte])
        // tuple and a truncated blob that must degrade to raw-hex
        // passthrough (RegistersParser.scala:80-88 behaviour).
        val mintRegs = Map(
          "R4" -> collHex(s"token$h"),
          "R5" -> collHex("minted"),
          "R6" -> RegisterParser.encodeInt(2),
          "R7" -> SigmaReader.encodeSigmaProp(
            md5Hex(s"sigmaprop:$h").concat(md5Hex(s"sigmaprop2:$h"))
              .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray),
          "R8" -> RegisterParser.encodeLong(1000L + h),
          "R9" -> (if (h % 2 == 0) SigmaReader.encodeBytePair(
            s"k$h".getBytes(StandardCharsets.UTF_8),
            s"v$h".getBytes(StandardCharsets.UTF_8))
          else "3c0e0e" + md5Hex(s"blob:$h").take(8)))
        val out1 = RawOutput(
          boxId = sha256Hex(s"box:$salt:$h:$i:0"),
          value = o1v,
          creationHeight = h,
          ergoTree = script((h + i) % 8),
          assets = if (mint) Seq(RawAsset(b1, 1000L + h)) else Nil,
          additionalRegisters = if (mint) mintRegs else Map.empty)
        val out2 = RawOutput(sha256Hex(s"box:$salt:$h:$i:1"), o2v, h,
          script((h + i + 3) % 8), Nil, Map.empty)
        val feeOut = RawOutput(sha256Hex(s"box:$salt:$h:$i:f"), TxFee, h, FeeTree, Nil, Map.empty)
        spendable.enqueue(out1.boxId -> o1v, out2.boxId -> o2v)
        val proof = SpendingProof(Some(md5Hex(s"proof:$salt:$h:$i")), "{}")
        RawTx(sha256Hex(s"tx:$salt:$h:$i"),
          Seq(RawInput(b1, Some(proof)), RawInput(b2, Some(proof))),
          if ((h + i) % 5 == 0) Seq(RawDataInput(b1)) else Nil,
          Seq(out1, out2, feeOut), Some(300 + (h + i) % 100))
      }
      val blockFee = nUser * TxFee
      val reward = ChainConst.minerRewardAtScala(h.toLong)
      val cbOut = RawOutput(sha256Hex(s"cb:$salt:$h"), reward + blockFee, h,
        minerScript(h), Nil, Map.empty)
      spendable.enqueue(cbOut.boxId -> cbOut.value)
      val coinbase = RawTx(sha256Hex(s"cbtx:$salt:$h"), Nil, Nil, Seq(cbOut), Some(200))
      val txs = userTxs :+ coinbase // coinbase is always last
      val id = sha256Hex(s"blk:$salt:$h")
      blocks += RawBlock(
        RawHeader(
          id = id, parentId = parent, version = 2, height = h,
          nBits = 0x1b03a30cL,
          difficulty = new java.math.BigDecimal(1000000L + h),
          timestamp = 1600000000000L + h.toLong * 120000L,
          stateRoot = md5Hex(s"state:$salt:$h"),
          adProofsRoot = md5Hex(s"adp:$salt:$h"),
          transactionsRoot = md5Hex(s"txr:$salt:$h"),
          extensionHash = md5Hex(s"ext:$salt:$h"),
          minerPk = md5Hex(s"minerpk:${h % 5}"),
          w = md5Hex(s"w:$h"), n = md5Hex(s"n:$h").take(16),
          d = "0",
          votes = "000000"),
        RawTransactions(id, txs),
        RawExtension(id, md5Hex(s"extd:$salt:$h"), "{}"),
        adProofs = None,
        size = 1000 + txs.flatMap(_.size).sum)
      parent = id
    }
    (blocks.result(), spendable.toSeq)
  }
}
