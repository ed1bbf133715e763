package graft

import graft.Lineage.LineageCut

import graft.chain._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the q51 backfill path (VERDICT r06 item 1:
  * recover backfill from 440 blk/s toward the r02 810 blk/s high-water).
  * Times each sub-plan of the derivation in isolation so the hot stage is
  * measurable instead of guessed. Run: `sbt "runMain graft.ProfBackfill"`.
  */
object ProfBackfill {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    queries.ChainOracle.ensureBackfill(spark)
    val dir = s"${queries.ChainOracle.Dir}/backfill"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    // warm JVM/codegen/parquet the way Bench does
    val rawW = spark.read.parquet(dir).as[RawBlock]
    rawW.count(); BlockDerivation.derive(rawW).blocks.count()

    def raw = spark.read.parquet(dir).as[RawBlock]

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("raw count")(raw.count())

      val t = BlockDerivation.derive(raw)
      time("txs count")(t.txs.count())
      time("outputs count")(t.outputs.count())
      time("inputs count")(t.inputs.count())
      time("blocks count")(t.blocks.count())
      time("utxo count")(UtxoQueries.utxos(t).count())
      time("registers count")(t.registers.count())
      time("assets count")(t.assets.count())
      time("ergoTrees count")(t.ergoTrees.count())

      // the actual q51 shape: one action over three agg subtrees
      time("q51 one-action (pin=identity)") {
        val t2 = BlockDerivation.derive(raw)
        val tip = t2.blocks.agg(max("height").as("tipHeight"), max("maxBoxGix").as("maxBoxGix"))
        val u = UtxoQueries.utxos(t2).agg(count(lit(1)).as("utxoCount"))
        val o = t2.outputs.agg(count(lit(1)).as("boxCount"))
        tip.crossJoin(u).crossJoin(o).count()
      }
      time("q51 one-action (pin=localCheckpoint)") {
        val t2 = BlockDerivation.derive(raw, pin = df => df.cutLineage(eager = false))
        val tip = t2.blocks.agg(max("height").as("tipHeight"), max("maxBoxGix").as("maxBoxGix"))
        val u = UtxoQueries.utxos(t2).agg(count(lit(1)).as("utxoCount"))
        val o = t2.outputs.agg(count(lit(1)).as("boxCount"))
        tip.crossJoin(u).crossJoin(o).count()
      }
      time("q51 single-pass") {
        val t2 = BlockDerivation.derive(raw)
        val r = t2.outputs
          .join(t2.inputs.select(col("boxId"), lit(1).as("_sp")), Seq("boxId"), "left_outer")
          .agg(max("settlementHeight").as("tipHeight"),
            max("globalIndex").as("maxBoxGix"),
            count(when(col("_sp").isNull, 1)).as("utxoCount"),
            count(lit(1)).as("boxCount"))
        println(r.collect().toSeq)
      }
      time("q51 current result") {
        val t2 = BlockDerivation.derive(raw)
        val tip = t2.blocks.agg(max("height").as("tipHeight"), max("maxBoxGix").as("maxBoxGix"))
        val u = UtxoQueries.utxos(t2).agg(count(lit(1)).as("utxoCount"))
        val o = t2.outputs.agg(count(lit(1)).as("boxCount"))
        println(tip.crossJoin(u).crossJoin(o).collect().toSeq)
      }
    }
    spark.stop()
  }
}
