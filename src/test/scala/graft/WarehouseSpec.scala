package graft

import graft.chain._
import graft.queries.{ChainQueries, ChainWarehouse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Pins the chain queries' storage layer: the [[ChainWarehouse]] built
  * batch-by-batch through ChainIngest must be row-identical to a one-shot
  * derivation of the same fixture (including the tip-carried cumulative
  * columns and the batch-boundary mining times), its MVCC UTXO state must
  * end in the base+live-deltas shape the queries are meant to exercise, and
  * the live view must reconstruct exactly the relational anti-join.
  */
class WarehouseSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val wh = ChainWarehouse.tables(spark)
  private lazy val oneShot = {
    import spark.implicits._
    BlockDerivation.derive(
      spark.createDataset(ChainFixture.generate(ChainQueries.FixtureBlocks)))
  }

  private def assertSame(a: DataFrame, b: DataFrame, name: String): Unit = {
    assert(a.schema.fieldNames.toSeq == b.schema.fieldNames.toSeq,
      s"$name column mismatch: ${a.schema.fieldNames.toSeq} vs ${b.schema.fieldNames.toSeq}")
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    assert(extra == 0 && missing == 0,
      s"$name differs from the one-shot derivation: +$extra/-$missing rows")
  }

  test("warehouse entity tables are row-identical to the one-shot derivation") {
    assertSame(wh.blocks, oneShot.blocks, "blocks")
    assertSame(wh.txs, oneShot.txs, "txs")
    // rawRegisters is a map column (set ops can't compare maps); its content
    // is pinned transitively by the registers table equality below
    assertSame(wh.outputs.drop("rawRegisters"),
      oneShot.outputs.drop("rawRegisters"), "outputs")
    assertSame(wh.inputs, oneShot.inputs, "inputs")
    assertSame(wh.assets, oneShot.assets, "assets")
    assertSame(wh.dataInputs, oneShot.dataInputs, "dataInputs")
    assertSame(wh.registers, oneShot.registers, "registers")
    assertSame(wh.tokens, oneShot.tokens, "tokens")
  }

  test("the UTXO state ends as a compacted base plus live deltas, and the view matches") {
    val ing = ChainWarehouse.ensure(spark)
    def versions(kind: String): Seq[Long] = {
      val root = Paths.get(s"${ChainWarehouse.Dir}/utxo/$kind")
      assert(Files.exists(root), s"missing utxo/$kind")
      val s = Files.list(root)
      try s.toArray.toSeq.map(_.toString.split('/').last)
        .filter(_.matches("v=\\d+")).map(_.drop(2).toLong).sorted
      finally s.close()
    }
    val bases = versions("base")
    val deltas = versions("delta")
    assert(bases.nonEmpty, "no compacted base was produced")
    // deltas AFTER the newest base: the live view must union both legs,
    // otherwise the queries only ever exercise the base path
    assert(deltas.count(_ > bases.max) >= 1,
      s"no live deltas above base ${bases.max} (deltas: $deltas)")

    val viewIds = ing.utxo(spark).select("boxId")
      .collect().map(_.getString(0)).toSet
    val rebuilt = UtxoQueries.utxos(wh).select("boxId")
      .collect().map(_.getString(0)).toSet
    assert(viewIds == rebuilt, "base+delta view != relational anti-join")
  }

  test("the fixture spans multiple height buckets so range scans really prune") {
    val bucketDirs = {
      val s = Files.list(Paths.get(s"${ChainWarehouse.Dir}/blocks"))
      try s.toArray.toSeq.map(_.toString.split('/').last)
        .count(_.startsWith("heightBucket="))
      finally s.close()
    }
    assert(bucketDirs >= 5, s"expected >=5 bucket partitions, got $bucketDirs")
    val scanned = ing()
      .blocksInRange(spark, ChainQueries.RangeScanFrom, ChainQueries.RangeScanTo)
    assert(scanned.count() ==
      ChainQueries.RangeScanTo - ChainQueries.RangeScanFrom + 1)
  }

  private def ing() = ChainWarehouse.ensure(spark)
}
