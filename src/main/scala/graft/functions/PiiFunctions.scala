package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction kernels (the C4/Dolma/FineWeb scrub stage),
  * shared by batch q124 and the streaming clean gate. Patterns are
  * restricted to the Java-regex ∩ RE2 subset so the DuckDB oracle scans
  * identically (same discipline as the BPE pre-tokenizer).
  *
  * Masking order matters and is part of the contract: emails first (so a
  * dotted quad inside a hostname never double-masks), then phones, then
  * IPv4s.
  */
object PiiFunctions {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
  def countPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")
  def countIps(text: Column): Column =
    size(regexp_extract_all(text, lit(IpRe), lit(0))).cast("long")

  /** Global mask with typed placeholders; pure codegen'd column work. */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      lit(EmailRe), lit("<EMAIL>")),
      lit(PhoneRe), lit("<PHONE>")),
      lit(IpRe), lit("<IP>"))
}
