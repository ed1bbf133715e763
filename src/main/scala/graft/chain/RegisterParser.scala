package graft.chain

import org.apache.spark.sql.functions.udf

import java.nio.charset.StandardCharsets

/** Register value expansion (SURVEY.md §2.3 P8, reference
  * RegistersParser.scala:20-88): raw register hex → (sigmaType, rendered
  * value). Delegates to [[SigmaReader]], which implements the full public
  * constant wire format — primitives, SGroupElement/SSigmaProp(ProveDlog),
  * nested collections, options, and tuples — and degrades anything it
  * cannot walk to `SUnparsed` + raw hex passthrough (the reference's
  * behaviour for unrenderable values).
  */
object RegisterParser {

  case class ParsedRegister(sigmaType: String, rendered: String)

  private def hexToBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray

  def parse(hex: String): ParsedRegister =
    if (hex == null) ParsedRegister("SUnparsed", "")
    else SigmaReader.readConstant(hex)
      .map { case (t, v) => ParsedRegister(t, v) }
      .getOrElse(ParsedRegister("SUnparsed", hex))

  /** Coll[SByte] rendered as UTF-8 (TokenPropsParser.scala:14-42 — token
    * name/description); None when the register isn't a byte coll or the
    * bytes aren't plausibly text (the reference's UTF-8 heuristic,
    * TokenPropsParser.scala:21-42: binary payloads masquerading as names
    * are rejected rather than rendered as mojibake).
    */
  def renderUtf8(hex: String): Option[String] = {
    val p = parse(hex)
    if (p.sigmaType != "Coll[SByte]") None
    else {
      val s = new String(hexToBytes(p.rendered), StandardCharsets.UTF_8)
      val bad = s.count(c => c == '�' || Character.isISOControl(c))
      if (s.nonEmpty && bad * 10 <= s.length) Some(s) else None
    }
  }

  /** Rendered integral value (SInt/SLong) or None. */
  def renderLong(hex: String): Option[Long] = {
    val p = parse(hex)
    if (p.sigmaType == "SInt" || p.sigmaType == "SLong") Some(p.rendered.toLong) else None
  }

  // ---- encode side (fixture + tests) ----

  private def vlqEncode(n: Long): Array[Byte] = {
    var v = n
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
    out.toArray
  }

  private def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  def encodeInt(n: Int): String =
    ("04" +: vlqEncode(zigzagEncode(n.toLong)).map("%02x".format(_)).toSeq).mkString

  def encodeLong(n: Long): String =
    ("05" +: vlqEncode(zigzagEncode(n)).map("%02x".format(_)).toSeq).mkString

  def encodeUtf8(s: String): String = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    ("0e" +: vlqEncode(b.length.toLong).map("%02x".format(_)).toSeq).mkString +
      b.map("%02x".format(_)).mkString
  }

  // ---- UDFs for the derivation pipeline ----

  val parseUdf = udf((hex: String) => if (hex == null) null else parse(hex))
  val renderUtf8Udf = udf((hex: String) => if (hex == null) None else renderUtf8(hex))
  val renderLongUdf = udf((hex: String) => if (hex == null) None else renderLong(hex))
}
