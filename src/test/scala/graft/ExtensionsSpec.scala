package graft

import graft.functions.{DotProductExpression, GraftExtensions, Hash60Expression, TokenCountExpression, WordShinglesExpression}
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
    assert(byName.keySet ==
      Set("token_count", "vec_dot", "word_shingles", "hash60"))
    assert(byName("token_count")(Seq(Literal("a b")))
      .isInstanceOf[TokenCountExpression])
    assert(byName("vec_dot")(Seq(Literal(Array(1.0)), Literal(Array(1.0))))
      .isInstanceOf[DotProductExpression])
    assert(byName("word_shingles")(Seq(Literal("a b c"), Literal(2)))
      .isInstanceOf[WordShinglesExpression])
    assert(byName("hash60")(Seq(Literal("x"), Literal(1)))
      .isInstanceOf[Hash60Expression])
  }

  test("hash60 == the pre-r18 declarative md5/conv form, bit for bit") {
    import graft.functions.TextFunctions
    import TestSpark.spark.implicits._
    Hash60Expression.register(spark)
    // adversarial inputs: empty, whitespace, unicode (multi-byte UTF-8),
    // long strings, md5-hex-looking strings, colons (prefix ambiguity)
    val samples = Seq("", " ", "a", "the", "join window", "héllo wörld",
      "日本語テキスト", "x" * 10000, "5:abc", ":", "a:b:c",
      "d41d8cd98f00b204e9800998ecf8427e") ++
      (0 until 500).map(i => s"tok$i some text ${i * 31}")
    val df = samples.toDF("s")
    for (seed <- Seq(0, 1, 7, 142, 1391, 1392, -3)) {
      val bad = df.select(
        TextFunctions.hash64(col("s"), seed).as("native"),
        TextFunctions.hash64Decl(col("s"), seed).as("decl"))
        .filter(col("native") =!= col("decl") ||
          col("native").isNull =!= col("decl").isNull)
        .count()
      assert(bad == 0, s"hash60 diverged from declarative form at seed $seed")
    }
    // null propagates like the declarative chain (md5 of null → null)
    val nullRow = Seq[Option[String]](None).toDF("s")
      .select(TextFunctions.hash64(col("s"), 1).as("h")).head
    assert(nullRow.isNullAt(0))
    // range law: 60-bit → always non-negative
    val negs = df.select(TextFunctions.hash64(col("s"), 9).as("h"))
      .filter(col("h") < 0).count()
    assert(negs == 0)
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
    // hash60('join', 1391): same value the declarative md5/conv form yields
    assert(s2.sql("SELECT hash60('join', 1391)").head.getLong(0) ==
      s2.sql("SELECT CAST(conv(substring(md5(concat('1391:', 'join')), 1, 15)," +
        " 16, 10) AS BIGINT)").head.getLong(0))
    // idempotent: a second install must not throw or change resolution
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT token_count('x')").head.getInt(0) == 1)
  }
}
