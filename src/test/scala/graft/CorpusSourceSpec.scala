package graft

import graft.sources.CorpusSource
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The raw-corpus sources (JSONL/CSV → documents schema): good rows decode,
  * malformed rows quarantine verbatim (never abort, never silently drop),
  * additive producer drift is tolerated, and the decoded frame matches the
  * engine's documents schema exactly.
  */
class CorpusSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def write(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-corpussrc")
    val f = dir.resolve(name)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("jsonl: good rows decode, corrupt rows quarantine, drift tolerated") {
    val path = write("docs.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "srcA", "n_chars": 11}""",
      // additive drift: unknown extra field must be ignored
      """{"doc_id": 2, "text": "two tokens", "lang": "de", "source": "srcB", "n_chars": 10, "crawl_ts": "2026-01-01"}""",
      // missing optional fields null-fill; n_chars derives from text
      """{"doc_id": 3, "text": "short"}""",
      // malformed json
      """{"doc_id": 4, "text": "unterminated""",
      // parses but lacks required text
      """{"doc_id": 5, "lang": "fr"}"""))
    val qdir = Files.createTempDirectory("graft-quarantine").toString + "/q"

    val d = CorpusSource.fromJsonl(spark, path, Some(qdir))
    assert(d.docs.schema == CorpusSource.schema, "decoded schema must be exact")
    val rows = d.docs.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val r3 = rows(2)
    assert(r3.isNullAt(2) && r3.isNullAt(3), "missing optionals null-fill")
    assert(r3.getLong(4) == "short".length.toLong, "n_chars derives from text")

    assert(d.quarantined.count() == 2, "both bad shapes quarantine")
    // EVERY quarantined jsonl row must survive VERBATIM for replay — the
    // malformed line AND the parsed-but-missing-required line (r12 ADVICE:
    // the latter used to be re-serialized lossily)
    val qlines = spark.read.text(qdir).collect().map(_.getString(0)).toSet
    assert(qlines == Set(
      """{"doc_id": 4, "text": "unterminated""",
      """{"doc_id": 5, "lang": "fr"}"""),
      s"raw lines must be preserved byte-for-byte: $qlines")
    // reasons distinguish the two bad shapes
    assert(d.quarantined.select("reason").distinct().count() == 2)
  }

  test("csv: header decode, malformed row quarantines, required-field rule") {
    val path = write("docs.csv", Seq(
      "doc_id,text,lang,source,n_chars",
      "1,alpha beta,en,srcA,10",
      "not_a_long,gamma,en,srcA,5", // doc_id fails to decode -> corrupt
      "3,delta epsilon,fr,srcB,13"))
    val d = CorpusSource.fromCsv(spark, path, None)
    assert(d.docs.orderBy("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(d.quarantined.count() == 1)
  }

  test("jsonl: round-trips the engine's own documents table losslessly") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val dir = Files.createTempDirectory("graft-jsonlrt").toString + "/dump"
    docs.coalesce(1).write.json(dir)
    val back = CorpusSource.fromJsonl(spark, dir).docs
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs.select("doc_id", "text", "lang", "source", "n_chars")).isEmpty,
      "decoded rows must equal the parquet originals")
  }
}
