package graft.functions

/** SigmaType string codec (SURVEY.md §2.8 / §1.2 — reference
  * SigmaType.scala:18-115): the recursive type ADT the reference serializes
  * as strings like `Coll[(SInt, Option[SLong])]`. The engine carries these
  * as opaque strings in columns (exactly as the reference's codecs do,
  * Codecs.scala:31) and uses this parser at the edges (validation,
  * register-type classification).
  */
object SigmaTypes {

  sealed trait SigmaType { def render: String }
  case class Simple(name: String) extends SigmaType { def render: String = name }
  case class SColl(of: SigmaType) extends SigmaType { def render = s"Coll[${of.render}]" }
  case class SOpt(of: SigmaType) extends SigmaType { def render = s"Option[${of.render}]" }
  case class STuple(of: Seq[SigmaType]) extends SigmaType {
    def render: String = of.map(_.render).mkString("(", ", ", ")")
  }

  private val SimpleKinds = Set(
    "SBoolean", "SByte", "SShort", "SInt", "SLong", "SBigInt",
    "SGroupElement", "SSigmaProp", "SString", "SUnit", "SAny")

  /** Recursive-descent parse; None on malformed input (the reference throws
    * through a Try at the same spot, SigmaType.scala:60-79).
    */
  def parse(s: String): Option[SigmaType] = {
    val (t, rest) = parseOne(s.trim)
    if (rest.trim.isEmpty) t else None
  }

  private def parseOne(s: String): (Option[SigmaType], String) = {
    if (s.startsWith("Coll[")) parseBracketed(s.drop(5)) match {
      case (Some(inner), rest) => (Some(SColl(inner)), rest)
      case (None, rest) => (None, rest)
    }
    else if (s.startsWith("Option[")) parseBracketed(s.drop(7)) match {
      case (Some(inner), rest) => (Some(SOpt(inner)), rest)
      case (None, rest) => (None, rest)
    }
    else if (s.startsWith("(")) {
      var rest = s.drop(1)
      val items = Seq.newBuilder[SigmaType]
      var ok = true
      var done = false
      while (!done && ok) {
        val (t, r) = parseOne(rest.trim)
        t match {
          case Some(x) =>
            items += x
            val r2 = r.trim
            if (r2.startsWith(",")) rest = r2.drop(1)
            else if (r2.startsWith(")")) { rest = r2.drop(1); done = true }
            else ok = false
          case None => ok = false
        }
      }
      if (ok) (Some(STuple(items.result())), rest) else (None, rest)
    } else {
      val name = s.takeWhile(c => c.isLetterOrDigit)
      if (SimpleKinds(name)) (Some(Simple(name)), s.drop(name.length))
      else (None, s)
    }
  }

  private def parseBracketed(s: String): (Option[SigmaType], String) = {
    val (t, rest) = parseOne(s.trim)
    val r = rest.trim
    if (t.isDefined && r.startsWith("]")) (t, r.drop(1)) else (None, r)
  }
}
