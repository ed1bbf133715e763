package graft

import graft.functions.{DotProductExpression, GraftExtensions, TokenCountExpression, WordShinglesExpression}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-surface install contract: every native expression is reachable
  * both at config time (`spark.sql.extensions=graft.functions
  * .GraftExtensions`) and at runtime (`GraftExtensions.registerAll`), from
  * ONE injection list — a cluster user must never discover that one name
  * works in the library and not in plain SQL.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("the injection list covers every native expression and builds the right nodes") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val byName = GraftExtensions.injections
      .map(i => i._1.funcName -> i._3).toMap
    assert(byName.keySet == Set("token_count", "vec_dot", "word_shingles"))
    assert(byName("token_count")(Seq(Literal("a b")))
      .isInstanceOf[TokenCountExpression])
    assert(byName("vec_dot")(Seq(Literal(Array(1.0)), Literal(Array(1.0))))
      .isInstanceOf[DotProductExpression])
    assert(byName("word_shingles")(Seq(Literal("a b c"), Literal(2)))
      .isInstanceOf[WordShinglesExpression])
  }

  test("registerAll makes every function SQL-callable on a fresh session") {
    // newSession() starts from a clean function registry — functions the
    // parent registered at runtime are absent, exactly a new SQL client
    val s2 = spark.newSession()
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT token_count('one two  three')").head.getInt(0) == 3)
    assert(s2.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))").head.getDouble(0) == 11.0)
    assert(s2.sql(
      "SELECT word_shingles(split('a b c', ' '), 2)").head.getSeq[String](0).toSet ==
      Set("a b", "b c"))
    // idempotent: a second install must not throw or change resolution
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT token_count('x')").head.getInt(0) == 1)
  }
}
