package graft

import graft.chain.{ChainFixture, RegisterParser, SigmaReader}
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the sigma wire-format reader (P6/P8). The real-chain
  * hexes come from the reference's public test blocks
  * (node-pool/src/test/resources/blocks/blocks.gz — mainnet data) so the
  * template split and register rendering are pinned against actual network
  * bytes, not just our own encoder.
  */
class SigmaReaderSpec extends AnyFunSuite {

  // Mainnet miner-reward tree: header 0x10 (segregated), 2 constants
  // (SInt 720 = minerRewardDelay, SSigmaProp ProveDlog pk), then template.
  private val rewardTree =
    "100204a00b08cd02be6d327940baf038d20640b9f58a57d30ef6d738e2672ac49c14519f27089b3a" +
      "ea02d192a39a8cc7a70173007301"

  test("mainnet reward tree: template = expression bytes after the two constants") {
    assert(SigmaReader.treeTemplate(rewardTree)
      .contains("ea02d192a39a8cc7a70173007301"))
  }

  test("mainnet P2PK tree (0008cd…) has no template") {
    assert(SigmaReader.treeTemplate(
      "0008cd0329682c93631cac24a69c47d31ab9c1422706fc0a3558275589c8258d22b4f60e").isEmpty)
  }

  test("segregated P2PK (single ProveDlog constant + bare 7300 root) has no template") {
    val pk = "02" + "ab" * 32
    assert(SigmaReader.treeTemplate("1001" + "08cd" + pk + "7300").isEmpty)
  }

  test("non-segregated and garbage trees degrade to no template") {
    assert(SigmaReader.treeTemplate("00d191a3").isEmpty)
    assert(SigmaReader.treeTemplate("10ff").isEmpty)        // absurd VLQ count
    assert(SigmaReader.treeTemplate("100104").isEmpty)      // truncated constant
    assert(SigmaReader.treeTemplate("zz").isEmpty)
  }

  test("mainnet register 100204a00b decodes as Coll[SInt] [2,720]") {
    assert(RegisterParser.parse("100204a00b") ==
      RegisterParser.ParsedRegister("Coll[SInt]", "[2,720]"))
  }

  test("mainnet Coll[SByte] register renders as payload hex") {
    val payload =
      "98040483030808cd039bb5fe52359a64c99a60fd944fc5e388cbdc4d37ff091cc841c3ee79060b8647" +
        "08cd" + "02" * 32 + "ff"
    // rebuild a length-correct Coll[SByte] (the golden block's full value is
    // 111 bytes; this checks layout, not that exact blob)
    val bytes = payload.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val hexLen = "%02x".format(bytes.length)
    assert(RegisterParser.parse("0e" + hexLen + payload) ==
      RegisterParser.ParsedRegister("Coll[SByte]", payload))
  }

  test("ProveDlog sigma-prop register renders the 33-byte point hex") {
    val point = "02" + "5e" * 32
    assert(RegisterParser.parse("08cd" + point) ==
      RegisterParser.ParsedRegister("SSigmaProp", point))
    // non-dlog sigma trees are unrenderable → passthrough
    assert(RegisterParser.parse("08ce" + point).sigmaType == "SUnparsed")
  }

  test("SGroupElement register renders the 33-byte point hex") {
    val point = "03" + "77" * 32
    assert(RegisterParser.parse("07" + point) ==
      RegisterParser.ParsedRegister("SGroupElement", point))
  }

  test("tuple, nested coll, and option registers render recursively") {
    assert(RegisterParser.parse(SigmaReader.encodeBytePair(
      "ab".getBytes("UTF-8"), "xy".getBytes("UTF-8"))) ==
      RegisterParser.ParsedRegister("(Coll[SByte], Coll[SByte])", "[6162,7879]"))
    assert(RegisterParser.parse(SigmaReader.encodeIntColl(Seq(1, -2, 300))) ==
      RegisterParser.ParsedRegister("Coll[SInt]", "[1,-2,300]"))
    assert(RegisterParser.parse(SigmaReader.encodeOptLong(Some(42L))) ==
      RegisterParser.ParsedRegister("Option[SLong]", "42"))
    assert(RegisterParser.parse(SigmaReader.encodeOptLong(None)) ==
      RegisterParser.ParsedRegister("Option[SLong]", "null"))
    // Coll[Coll[SByte]] — type 0x1a (24+2), two byte colls
    assert(RegisterParser.parse("1a02" + "026162" + "017a") ==
      RegisterParser.ParsedRegister("Coll[Coll[SByte]]", "[6162,7a]"))
    // (SInt, SLong) via explicit pair: 0x40 (60+4 = SInt first) + second type
    assert(RegisterParser.parse("4005" + "04" + "06") ==
      RegisterParser.ParsedRegister("(SInt, SLong)", "[2,3]"))
  }

  test("SBigInt, SBoolean, SByte, SShort primitives render like the reference") {
    assert(RegisterParser.parse("060100").sigmaType == "SBigInt")
    assert(RegisterParser.parse("0602022b") ==
      RegisterParser.ParsedRegister("SBigInt", "555"))
    assert(RegisterParser.parse("0101") ==
      RegisterParser.ParsedRegister("SBoolean", "true"))
    assert(RegisterParser.parse("027f") ==
      RegisterParser.ParsedRegister("SByte", "127"))
    assert(RegisterParser.parse("0285") ==    // signed byte -123
      RegisterParser.ParsedRegister("SByte", "-123"))
    assert(RegisterParser.parse("03c801") ==  // zigzag(200) = 100
      RegisterParser.ParsedRegister("SShort", "100"))
  }

  test("over-long VLQ fails the decode instead of wrapping (ADVICE fix)") {
    // 11 continuation bytes — would shift past 63 and wrap in naive code
    assert(RegisterParser.parse("04" + "ff" * 11 + "01").sigmaType == "SUnparsed")
    // trailing junk after a valid constant is rejected too
    assert(RegisterParser.parse(RegisterParser.encodeInt(7) + "00").sigmaType == "SUnparsed")
  }

  test("fixture scripts are real trees: P2PK has no template, others share k%4 templates") {
    assert(SigmaReader.treeTemplate(ChainFixture.script(0)).isEmpty)
    assert(SigmaReader.treeTemplate(ChainFixture.script(3)).isEmpty)
    val t1 = SigmaReader.treeTemplate(ChainFixture.script(1))
    val t5 = SigmaReader.treeTemplate(ChainFixture.script(5))
    assert(t1.nonEmpty && t1 == t5, "scripts 1 and 5 share template k%4=1")
    assert(SigmaReader.treeTemplate(ChainFixture.script(2)) !=
      SigmaReader.treeTemplate(ChainFixture.script(1)))
  }
}
