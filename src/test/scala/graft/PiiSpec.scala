package graft

import graft.functions.PiiFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Intent tests for the PII scrub kernels: the q124 oracle hash proves
  * Spark and DuckDB agree byte-for-byte, but both run the SAME regexes —
  * so coverage (does the pattern match what a real crawl contains, and
  * ONLY that) is pinned here with explicit expected counts, including
  * adversarial negatives.
  */
class PiiSpec extends AnyFunSuite {
  import TestSpark._

  private def counts(text: String): (Long, Long, Long) = {
    import spark.implicits._
    val r = Seq(text).toDF("t")
      .select(countEmails(col("t")), countPhones(col("t")), countIps(col("t")))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def masked(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(maskPii(col("t"))).head().getString(0)
  }

  test("phone positives: NANP shapes and E.164") {
    assert(counts("call 555-123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call 555.123.4567 now") == ((0L, 1L, 0L)))
    assert(counts("call 555 123 4567 now") == ((0L, 1L, 0L)))
    assert(counts("call (555) 123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call (555)123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call +1 555-123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call 1-555-123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call +1(555) 123-4567 now") == ((0L, 1L, 0L)))
    assert(counts("call +15551234567 now") == ((0L, 1L, 0L)))
    assert(counts("call +442079460958 now") == ((0L, 1L, 0L)))
    // the full match is the WHOLE phone (prefix not left behind)
    assert(masked("call +1 555-123-4567 now") == "call <PHONE> now")
    assert(masked("call (555) 123-4567 now") == "call <PHONE> now")
  }

  test("phone negatives: years, serials, bare digit runs") {
    assert(counts("range 2023-2024 fine") == ((0L, 0L, 0L)))
    assert(counts("order 12345678 shipped")._2 == 0L)
    assert(counts("id 5551234567 bare ten digits")._2 == 0L)
    assert(counts("date 14.08.2026 logged")._2 == 0L)
    assert(counts("part 555-123-45678 overlong")._2 == 0L)
    assert(counts("sum 3+12345 short")._2 == 0L)
  }

  test("ipv4 positives: full octet range") {
    assert(counts("from 10.0.0.1 ok")._3 == 1L)
    assert(counts("from 192.168.100.254 ok")._3 == 1L)
    assert(counts("from 0.0.0.0 ok")._3 == 1L)
    assert(counts("from 255.255.255.255 ok")._3 == 1L)
    assert(counts("from 98.5.244.23 ok")._3 == 1L)
    assert(masked("from 203.0.113.7 ok") == "from <IP> ok")
  }

  test("ipv4 negatives: out-of-range octets, versions, digit-run embeddings") {
    assert(counts("build 300.1.2.3 nope")._3 == 0L)
    assert(counts("build 256.1.2.3 nope")._3 == 0L)
    assert(counts("build 999.12.34.56 nope")._3 == 0L)
    assert(counts("tail 1.2.3.456 nope")._3 == 0L)
    assert(counts("semver v1.2.3 nope")._3 == 0L)
    assert(counts("semver v10.1.2.3 prefixed-by-word nope")._3 == 0L)
    assert(counts("glued a1.2.3.4 nope")._3 == 0L)
    assert(counts("octets 1.2.3 only-three nope")._3 == 0L)
    // documented limitation (shared with C4's scrubber): a 5-part dotted
    // string masks its leading in-range quad — RE2 has no lookahead to
    // forbid a trailing `.digit`, and the pattern set is the Java ∩ RE2
    // subset by contract
    assert(counts("five 1.2.3.4.5 parts")._3 == 1L)
  }

  private def countSC(text: String): (Long, Long) = {
    import spark.implicits._
    val r = Seq(text).toDF("t")
      .select(countSsns(col("t")), countCards(col("t"))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("ssn positives and negatives") {
    assert(countSC("ssn 123-45-6789 on file") == ((1L, 0L)))
    assert(masked("ssn 123-45-6789 on file") == "ssn <SSN> on file")
    assert(countSC("call 123-456-7890 phone-shaped")._1 == 0L)
    assert(countSC("id 1234-56-7890 overlong")._1 == 0L)
    assert(countSC("id 123-45-67890 overlong-serial")._1 == 0L)
    assert(countSC("bare 123456789 nine-digits")._1 == 0L)
  }

  test("card positives and negatives") {
    assert(countSC("pay 1234 5678 9012 3456 now")._2 == 1L)
    assert(countSC("pay 1234-5678-9012-3456 now")._2 == 1L)
    assert(countSC("amex 3714 496353 98431 now")._2 == 1L)
    assert(masked("pay 1234 5678 9012 3456 now") == "pay <CARD> now")
    assert(countSC("mixed 1234 5678-9012 3456 separators")._2 == 0L)
    assert(countSC("bare 1234567890123456 run")._2 == 0L)
    assert(countSC("short 1111 2222 3333 groups")._2 == 0L)
    // a dashed card must mask as ONE card, not leak an SSN/phone fragment
    val m = masked("pay 1234-5678-9012-3456 now")
    assert(m == "pay <CARD> now", m)
  }

  test("masking order and placeholder integrity on mixed text") {
    val text = "mail bob@h10.example.com or (555) 123-4567 / +4915123456789 " +
      "from 172.16.254.1, build 999.1.2.3 v2.14.3 range 2023-2024"
    val got = masked(text)
    assert(got == "mail <EMAIL> or <PHONE> / <PHONE> " +
      "from <IP>, build 999.1.2.3 v2.14.3 range 2023-2024", got)
    // a dotted quad inside a hostname is part of the EMAIL mask (order:
    // emails first), never double-masked
    assert(!got.contains("<IP>.example.com"))
  }

  test("the q124 plant shapes count exactly as intended") {
    // replicate the plant for one doc id and assert the intended counts:
    // 1 email, 3 phones, 1 ip — negatives contribute nothing
    val id = 137L
    val text = s" contact user$id@mail.example.com call (" +
      s"${200 + id % 700}) ${100 + id * 13 % 900}-" +
      f"${id * 7919 % 10000}%04d or +1 ${200 + id * 3 % 700}-" +
      f"${100 + id * 7 % 900}-${id * 97 % 10000}%04d intl +44" +
      f"${id * 37 % 1000000000L}%09d ip ${id % 256}." +
      s"${id * 31 % 256}.${id * 17 % 256}.${id * 7 % 256}" +
      s" v${id % 10}.${id % 7}.${id % 5} build 999.${id * 5 % 256}." +
      s"${id * 11 % 256}.${id * 3 % 256}" +
      s" ssn ${100 + id % 900}-${10 + id % 90}-${1000 + id * 7 % 9000}" +
      s" card ${1000 + id * 3 % 9000} ${1000 + id * 11 % 9000} " +
      s"${1000 + id * 13 % 9000} ${1000 + id * 17 % 9000}" +
      " order 1234-56-789 batch 1111 2222 3333" +
      " range 2023-2024 ref 12345678"
    assert(counts(text) == ((1L, 3L, 1L)))
    assert(countSC(text) == ((1L, 1L)))
    val m = masked(text)
    assert(m.contains("<EMAIL>") && m.contains("<IP>"))
    assert(m.contains("<SSN>") && m.contains("<CARD>"))
    assert("<PHONE>".r.findAllIn(m).size == 3, m)
    assert(m.contains("999.") && m.contains("range 2023-2024"), m)
    assert(m.contains("order 1234-56-789") && m.contains("batch 1111 2222 3333"), m)
  }
}
