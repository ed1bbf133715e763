package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction kernels (the C4/Dolma/FineWeb scrub stage),
  * shared by batch q124 and the streaming clean gate. Patterns are
  * restricted to the Java-regex ∩ RE2 subset — no lookaround, ASCII
  * classes, `\b` word boundaries — so the DuckDB oracle scans identically
  * (same discipline as the BPE pre-tokenizer).
  *
  * Pattern breadth is production-shaped, not plant-shaped:
  *  - IPv4: full dotted-quad with every octet range-checked 0–255 and
  *    `\b`-guarded on both ends, so `300.1.2.3`, `1.2.3.456`, `v1.2.3`,
  *    and digit-run embeddings never match. Known, documented limit shared
  *    with the C4 scrubber: a bare in-range quad used as a VERSION string
  *    (`1.2.3.4`) is textually indistinguishable from an address and IS
  *    masked; a 5-part dotted string masks its leading quad (RE2 has no
  *    lookahead to forbid a trailing `.digit`).
  *  - Phones: NANP with parenthesized or separator-delimited area code
  *    (`(555) 123-4567`, `555-123-4567`, `555.123.4567`), optional `1`/`+1`
  *    country prefix, plus bare-E.164 (`+` and 8–15 digits). Unseparated
  *    7- or 10-digit runs deliberately do NOT match — without a `+` or
  *    separators they are indistinguishable from ids/serials, and a corpus
  *    scrub that eats every long number destroys training data.
  *
  * Masking order matters and is part of the contract: emails first (so a
  * dotted quad inside a hostname never double-masks), then phones, then
  * IPv4s (safe in this order because a valid quad's octets are ≤ 3 digits
  * and the phone shapes all require a 4-digit final group, so no phone
  * pattern can consume part of a quad).
  */
object PiiFunctions {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  private val Sep = "[ .-]"
  /** NANP (paren / separated) with optional country prefix, then bare
    * E.164. Alternatives are self-contained so the FULL match is exactly
    * the phone (literal placeholder replacement needs no group refs, which
    * Java (`$1`) and RE2 (`\1`) spell differently).
    */
  val PhoneRe: String =
    s"(\\+?1$Sep?)?\\([0-9]{3}\\)$Sep?[0-9]{3}$Sep?[0-9]{4}\\b" +
      s"|(\\+?1$Sep)?\\b[0-9]{3}$Sep[0-9]{3}$Sep[0-9]{4}\\b" +
      "|\\+[0-9]{8,15}\\b"

  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
  val IpRe: String = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"

  /** US SSN, strict 3-2-4 dashed shape (the dashless 9-digit run is
    * indistinguishable from an id and deliberately not matched). Disjoint
    * from every phone shape (those all need a 3-digit middle group).
    */
  val SsnRe: String = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Payment-card numbers, 4×4 with uniform space/dash separators (the
    * standard embossed grouping; bare 16-digit runs are id-ambiguous and
    * not matched). Amex-style 4-6-5 is included. Uniformity is enforced
    * by ENUMERATING the separator variants — RE2 has no backreferences,
    * so `([ -])...\1` is outside the Java∩RE2 contract. Disjoint from
    * phones (no 4-digit leading group there) and from SSNs.
    */
  val CardRe: String =
    "\\b[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}\\b" +
      "|\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b" +
      "|\\b[0-9]{4} [0-9]{6} [0-9]{5}\\b" +
      "|\\b[0-9]{4}-[0-9]{6}-[0-9]{5}\\b"

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
  def countPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")
  def countIps(text: Column): Column =
    size(regexp_extract_all(text, lit(IpRe), lit(0))).cast("long")
  def countSsns(text: Column): Column =
    size(regexp_extract_all(text, lit(SsnRe), lit(0))).cast("long")
  def countCards(text: Column): Column =
    size(regexp_extract_all(text, lit(CardRe), lit(0))).cast("long")

  /** Global mask with typed placeholders; pure codegen'd column work.
    * Order (part of the contract): emails, then cards (before phones —
    * both are digit groups, and cards are the longer match), then SSNs,
    * then phones, then IPv4s.
    */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      text,
      lit(EmailRe), lit("<EMAIL>")),
      lit(CardRe), lit("<CARD>")),
      lit(SsnRe), lit("<SSN>")),
      lit(PhoneRe), lit("<PHONE>")),
      lit(IpRe), lit("<IP>"))
}
