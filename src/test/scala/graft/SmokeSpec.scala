package graft

import org.scalatest.funsuite.AnyFunSuite

class SmokeSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and every oracle key exists") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed")
    }
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
  }

  test("q1_agg values are sane") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf0001).collect()
    assert(rows.length > 0)
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    assert(n > 1000, s"expected ~6000 lineitems, got $n")
  }
}
