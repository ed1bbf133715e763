package graft

import graft.streaming.StreamingPacking
import graft.streaming.StreamingPacking.{DocTok, PackAssign}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sequence-packing contract: documents arriving in doc_id order
  * (the append-only ingest shape) pack incrementally into EXACTLY the batch
  * q132 manifests, across any micro-batch boundary; out-of-order arrivals
  * are flagged late, never silently appended.
  */
class StreamingPackingSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus(): Array[DocTok] = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
      .map { case (s, d, n) => DocTok(s, d, n) }
      .sortBy(_.docId)
  }

  test("streamed packing across a batch boundary aggregates to the batch q132 manifest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus()
    val mid = docs(docs.length / 2).docId

    val stream = MemoryStream[DocTok]
    val query = StreamingPacking.pack(stream.toDS()).writeStream
      .format("memory").queryName("spack").outputMode("append").start()
    try {
      stream.addData(docs.filter(_.docId < mid).toIndexedSeq)
      query.processAllAvailable()
      stream.addData(docs.filter(_.docId >= mid).toIndexedSeq)
      query.processAllAvailable()

      val assigns = spark.table("spack").as[PackAssign].collect()
      assert(assigns.length == docs.length, "every doc assigned exactly once")
      assert(assigns.forall(!_.late), "an in-order replay must flag nothing late")

      // aggregate the per-doc assignments into q132's manifest shape
      val streamed = assigns.groupBy(a => (a.source, a.shard, a.binId))
        .map { case ((src, sh, bin), as) =>
          (src, sh, bin) -> ((as.length.toLong, as.map(_.docId).min,
            as.count(a => a.binEnd > a.binId).toLong, as.map(_.nt).sum))
        }
      val batch = SparkEntry.queries("q132_sequence_pack")(spark, sf0001)
        .collect().map { r =>
          (r.getString(0), r.getLong(1), r.getLong(2)) ->
            ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
        }.toMap
      assert(streamed == batch,
        s"streamed manifests must equal batch q132 (streamed=${streamed.size}, batch=${batch.size})")
    } finally query.stop()
  }

  test("out-of-order arrival is flagged late with state untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DocTok]
    val query = StreamingPacking.pack(stream.toDS()).writeStream
      .format("memory").queryName("spacklate").outputMode("append").start()
    try {
      stream.addData(DocTok("s", 10L, 100L), DocTok("s", 20L, 200L))
      query.processAllAvailable()
      // 15 regresses behind the shard frontier (20): must be flagged, and
      // the frontier must be unmoved so 30 packs as if 15 never arrived
      stream.addData(DocTok("s", 15L, 50L))
      query.processAllAvailable()
      stream.addData(DocTok("s", 30L, 60L))
      query.processAllAvailable()

      val got = spark.table("spacklate").as[PackAssign].collect()
        .map(a => a.docId -> a).toMap
      assert(!got(10L).late && got(10L).binId == 0L && got(10L).binEnd == 0L)
      assert(!got(20L).late && got(20L).binId == 0L && got(20L).binEnd == 1L,
        s"300 cumulative tokens straddle the 256 boundary: ${got(20L)}")
      assert(got(15L).late && got(15L).binId == -1L, s"regression must flag: ${got(15L)}")
      assert(!got(30L).late && got(30L).binId == 1L && got(30L).binEnd == 1L,
        s"frontier must ignore the late doc: ${got(30L)}")
    } finally query.stop()
  }
}
