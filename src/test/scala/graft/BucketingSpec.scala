package graft

import graft.chain._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The co-located-join claim, proven on the physical plan: bucketed
  * outputs ⋈ inputs on boxId must not exchange either side.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed outputs-inputs join is shuffle-free and correct") {
    import spark.implicits._
    val t = BlockDerivation.derive(spark.createDataset(ChainFixture.generate(60)))
    val base = Files.createTempDirectory("graft-buckets").toString

    Bucketing.writeBucketed(
      t.outputs.select("boxId", "ergValue", "ergoTreeHash"),
      "bkt_outputs", s"$base/outputs", "boxId", 8)
    Bucketing.writeBucketed(
      t.inputs.select("boxId", "txId"),
      "bkt_inputs", s"$base/inputs", "boxId", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "bkt_outputs")
        .join(Bucketing.table(spark, "bkt_inputs"), "boxId")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle:\n$plan")
      // and the join is still the correct spent-set
      val expected = UtxoQueries.spentBoxes(t).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_outputs")
      spark.sql("DROP TABLE IF EXISTS bkt_inputs")
    }
  }
}
