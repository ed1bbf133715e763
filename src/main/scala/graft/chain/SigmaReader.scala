package graft.chain

import graft.functions.SigmaTypes
import graft.functions.SigmaTypes._

/** Self-contained reader for the public sigma wire format (the sigmastate
  * serialization spec): type codes, constant data layouts, and the ErgoTree
  * header/constant-segment framing. Replaces the round-1 stand-ins for
  *  - P6 template extraction (reference ErgoTreeParser.scala:25-28,58-81 —
  *    `deserializeHeaderWithTreeBytes` + the T8 discrimination on the root),
  *  - P8 recursive register rendering (reference RegistersParser.scala:20-88
  *    — renderEvaluatedValue over prims/colls/tuples/options/sigma props).
  *
  * Wire format implemented (public spec):
  *  - embeddable type codes 1..8 (SBoolean..SSigmaProp); constructed types
  *    as `constrId*12 + elemCode` — Coll (12), Coll[Coll] (24), Option (36),
  *    Option[Coll] (48), pairs (60/72/84; elemCode 0 ⇒ the non-embeddable
  *    component types follow explicitly), general tuples (96: length byte +
  *    item types);
  *  - data: zigzag-VLQ shorts/ints/longs, length-prefixed big-endian
  *    SBigInt, 33-byte compressed SGroupElement, ProveDlog sigma props
  *    (0xcd + point — other sigma trees render as unparsed, matching the
  *    reference's OptionT.none), raw-byte Coll[SByte], recursive
  *    collections/options/tuples;
  *  - tree framing: header bit 0x10 = constant segregation, bit 0x08 =
  *    declared-size VLQ present, then nConsts + constants + template bytes.
  *
  * Anything outside this surface degrades to `None` (registers stay
  * `SUnparsed` raw hex; trees yield no template) — never a wrong value.
  * VLQs are bounded to 10 bytes / shift ≤ 63 so malformed input cannot wrap
  * into garbage values.
  */
object SigmaReader {

  private final class Fail extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Fail

  private final class Cursor(val bytes: Array[Byte]) {
    var pos = 0
    def remaining: Int = bytes.length - pos
    def u8(): Int = { if (pos >= bytes.length) fail(); val b = bytes(pos) & 0xff; pos += 1; b }
    def i8(): Int = { if (pos >= bytes.length) fail(); val b = bytes(pos); pos += 1; b }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) fail()
      val r = bytes.slice(pos, pos + n); pos += n; r
    }
  }

  /** Unsigned LEB128, bounded: > 10 bytes or shift past 63 fails the decode
    * (instead of silently wrapping through the JVM's shift-mod-64).
    */
  private def vlq(cur: Cursor): Long = {
    var result = 0L
    var shift = 0
    var n = 0
    while (true) {
      if (shift > 63 || n >= 10) fail()
      val b = cur.u8()
      result |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return result
      shift += 7
      n += 1
    }
    result
  }

  private def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  private def hexToBytes(s: String): Array[Byte] = {
    if (s.length % 2 != 0 || !s.forall(c => Character.digit(c, 16) >= 0)) fail()
    s.grouped(2).map(b => Integer.parseInt(b, 16).toByte).toArray
  }

  private val PrimNames = Array(
    "", "SBoolean", "SByte", "SShort", "SInt", "SLong", "SBigInt",
    "SGroupElement", "SSigmaProp")

  private def prim(code: Int): SigmaType =
    if (code >= 1 && code <= 8) Simple(PrimNames(code)) else fail()

  /** One serialized type (TypeSerializer layout). */
  private def readType(cur: Cursor): SigmaType = {
    val c = cur.u8()
    if (c == 0) fail()
    else if (c < 12) prim(c)
    else if (c == 96) { // general tuple: length byte + item types
      val n = cur.u8()
      if (n < 2 || n > 255) fail()
      STuple((0 until n).map(_ => readType(cur)))
    } else if (c > 96) fail() // SBox/SAvlTree/... — not renderable constants
    else {
      val constr = c / 12
      val elemCode = c % 12
      def elem: SigmaType = if (elemCode == 0) readType(cur) else prim(elemCode)
      constr match {
        case 1 => SColl(elem)
        case 2 => SColl(SColl(elem))
        case 3 => SOpt(elem)
        case 4 => SOpt(SColl(elem))
        case 5 => val t1 = elem; STuple(Seq(t1, readType(cur))) // (e, T) / (S1, S2)
        case 6 => // (T, e) — first type explicit; elemCode 0 is out of scope
          if (elemCode == 0) fail()
          else { val t1 = readType(cur); STuple(Seq(t1, prim(elemCode))) }
        case 7 => // (e, e) symmetric pair
          if (elemCode == 0) fail() else STuple(Seq(prim(elemCode), prim(elemCode)))
        case _ => fail()
      }
    }
  }

  /** One serialized value of type `t`, rendered exactly like the reference:
    * numerics decimal, byte colls + EC points as hex, nested structures as
    * `[a,b,...]`, absent options as `null`.
    */
  private def readValue(cur: Cursor, t: SigmaType): String = t match {
    case Simple("SBoolean") => if (cur.u8() != 0) "true" else "false"
    case Simple("SByte") => cur.i8().toString
    case Simple("SShort") | Simple("SInt") | Simple("SLong") =>
      zigzag(vlq(cur)).toString
    case Simple("SBigInt") =>
      val n = vlq(cur).toInt
      if (n <= 0 || n > 32) fail()
      new java.math.BigInteger(cur.take(n)).toString
    case Simple("SGroupElement") => hex(cur.take(33))
    case Simple("SSigmaProp") =>
      // ProveDlog only (0xcd + compressed point) — other sigma trees are
      // unrenderable in the reference too (RegistersParser.scala:32).
      if (cur.u8() != 0xcd) fail()
      hex(cur.take(33))
    case SColl(Simple("SByte")) =>
      val n = vlq(cur).toInt
      if (n < 0) fail()
      hex(cur.take(n))
    case SColl(Simple("SBoolean")) =>
      val n = vlq(cur).toInt
      if (n < 0) fail()
      val packed = cur.take((n + 7) / 8)
      (0 until n).map(i => if ((packed(i / 8) >> (i % 8) & 1) != 0) "true" else "false")
        .mkString("[", ",", "]")
    case SColl(el) =>
      val n = vlq(cur).toInt
      if (n < 0) fail()
      (0 until n).map(_ => readValue(cur, el)).mkString("[", ",", "]")
    case SOpt(el) =>
      if (cur.u8() == 0) "null" else readValue(cur, el)
    case STuple(items) =>
      items.map(readValue(cur, _)).mkString("[", ",", "]")
    case _ => fail()
  }

  /** Parse one serialized constant: (rendered type term, rendered value). */
  def readConstant(hexStr: String): Option[(String, String)] =
    try {
      val cur = new Cursor(hexToBytes(hexStr))
      val t = readType(cur)
      val v = readValue(cur, t)
      if (cur.remaining != 0) None else Some((t.render, v))
    } catch { case _: Fail | _: ArrayIndexOutOfBoundsException => None }

  /** ErgoTree template extraction (P6): returns the serialized-expression
    * bytes after the segregated constants, or None when the tree has no
    * template in the reference's sense — not constant-segregated (covers
    * the bare `0008cd…` P2PK form), zero constants, a segregated P2PK
    * (single ProveDlog constant + bare `7300` placeholder root — the
    * `SigmaPropConstant(ProveDlogProp)` case of ErgoTreeParser.scala:44-45),
    * or anything this reader cannot walk.
    */
  def treeTemplate(hexStr: String): Option[String] =
    try {
      val cur = new Cursor(hexToBytes(hexStr))
      val header = cur.u8()
      if ((header & 0x10) == 0) None // no constant segregation ⇒ not a T8
      else {
        if ((header & 0x08) != 0) vlq(cur) // declared tree size
        val n = vlq(cur).toInt
        if (n <= 0 || n > 4096) None
        else {
          val consts = (0 until n).map { _ =>
            val t = readType(cur)
            val v = readValue(cur, t)
            (t, v)
          }
          if (cur.remaining == 0) None
          else {
            val template = hex(cur.take(cur.remaining))
            val segregatedP2pk =
              n == 1 && consts.head._1 == Simple("SSigmaProp") && template == "7300"
            if (segregatedP2pk) None else Some(template)
          }
        }
      }
    } catch { case _: Fail | _: ArrayIndexOutOfBoundsException => None }

  // ---- encode side (fixture + property tests) ----

  private def vlqEncode(n: Long): String = {
    var v = n
    val out = new StringBuilder
    while ((v & ~0x7fL) != 0) { out.append("%02x".format((v & 0x7f) | 0x80)); v >>>= 7 }
    out.append("%02x".format(v))
    out.toString
  }

  /** (Coll[SByte], Coll[SByte]) pair — EIP-004-adjacent shapes. */
  def encodeBytePair(a: Array[Byte], b: Array[Byte]): String =
    "3c0e0e" + vlqEncode(a.length.toLong) + hex(a) + vlqEncode(b.length.toLong) + hex(b)

  /** Coll[SInt]. */
  def encodeIntColl(xs: Seq[Int]): String =
    "10" + vlqEncode(xs.length.toLong) +
      xs.map(x => vlqEncode((x.toLong << 1) ^ (x.toLong >> 63))).mkString

  /** SSigmaProp (ProveDlog) from a deterministic fake-but-well-formed
    * compressed point (0x02 prefix + 32 payload bytes).
    */
  def encodeSigmaProp(payload32: Array[Byte]): String = {
    require(payload32.length == 32)
    "08cd02" + hex(payload32)
  }

  /** Option[SLong]: Some(v) / None. */
  def encodeOptLong(v: Option[Long]): String =
    "29" + v.map(x => "01" + vlqEncode((x << 1) ^ (x >> 63))).getOrElse("00")
}
