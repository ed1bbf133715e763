package graft

import graft.functions.{DotProductExpression, GraftExtensions, Hash60Expression, LineStructsExpression, TokenCountExpression, WordBigramsExpression, WordShinglesExpression}
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
      Set("token_count", "vec_dot", "word_shingles", "hash60",
        "word_bigrams", "line_structs", "char_pairs"))
    assert(byName("token_count")(Seq(Literal("a b")))
      .isInstanceOf[TokenCountExpression])
    assert(byName("vec_dot")(Seq(Literal(Array(1.0)), Literal(Array(1.0))))
      .isInstanceOf[DotProductExpression])
    assert(byName("word_shingles")(Seq(Literal("a b c"), Literal(2)))
      .isInstanceOf[WordShinglesExpression])
    assert(byName("hash60")(Seq(Literal("x"), Literal(1)))
      .isInstanceOf[Hash60Expression])
    assert(byName("word_bigrams")(Seq(Literal("a b")))
      .isInstanceOf[WordBigramsExpression])
    assert(byName("line_structs")(Seq(Literal("a b"), Literal(8)))
      .isInstanceOf[LineStructsExpression])
    assert(byName("char_pairs")(Seq(Literal("ab")))
      .isInstanceOf[graft.functions.CharPairsExpression])
  }

  test("char_pairs == the declarative transform/substr form, bit for bit, " +
    "over adversarial words") {
    import TestSpark.spark.implicits._
    graft.functions.CharPairsExpression.register(spark)
    val samples = Seq("", "a", "ab", "abc", "aaaa", "héllo", "日本語テキスト",
      "a日b", "𝕏𝕐ℤ", "x" * 300, "  ", "a b") ++
      (0 until 200).map(i => s"w${i}tok${(i * 13) % 97}")
    val df = samples.toDF("w")
    val bad = df.select(
      call_function("char_pairs", col("w")).as("native"),
      when(length(col("w")) >= 2,
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2))))
        .otherwise(array().cast("array<string>")).as("decl"))
      .filter(col("native") =!= col("decl") ||
        col("native").isNull =!= col("decl").isNull)
      .count()
    assert(bad == 0, "char_pairs diverged from the declarative form")
  }

  test("word_bigrams == the declarative transform/element_at form, " +
    "bit for bit, over adversarial token arrays") {
    import graft.functions.TextFunctions
    import TestSpark.spark.implicits._
    WordBigramsExpression.register(spark)
    val samples: Seq[Seq[String]] = Seq(
      Seq.empty, Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq(""), Seq("", ""), Seq("", "a", ""), Seq("a", "", "b"),
      Seq("héllo", "wörld", "日本語"), Seq("x" * 500, "y" * 500),
      Seq("same", "same", "same")) ++
      (0 until 200).map(i => (0 to i % 12).map(j => s"t${(i * 7 + j) % 40}"))
    val df = samples.toDF("tk")
    val bad = df.select(
      TextFunctions.bigrams(col("tk")).as("native"),
      TextFunctions.bigramsHof(col("tk")).as("decl"))
      .filter(col("native") =!= col("decl") ||
        col("native").isNull =!= col("decl").isNull)
      .count()
    assert(bad == 0, "word_bigrams diverged from the declarative form")
    // null propagates
    val nullRow = Seq[Option[Seq[String]]](None).toDF("tk")
      .select(TextFunctions.bigrams(col("tk")).as("b")).head
    assert(nullRow.isNullAt(0))
  }

  test("line_structs == the declarative lineArrays mapped through " +
    "struct(concat_ws, size), bit for bit, over adversarial docs") {
    import TestSpark.spark.implicits._
    LineStructsExpression.register(spark)
    val samples = Seq(
      "", " ", "  ", "\t", "\n", "\n\n", "a", "a b c",
      "a b c d e f g h i j k l",              // multiple windows at L=8
      "  leading and trailing  ",
      "\tlead-tab middle\ttab",
      "line one\nline two",
      "line one\n\nline three",                // empty middle line dropped
      "\nstarts with newline",
      "ends with newline\n",
      "crlf line\r\nnext",                     // \r survives trim, dies in \s+
      "  spaced line  \n\tother\t\n   \n",
      "héllo wörld\n日本語 テキスト",
      ("tok " * 100).trim,                     // 100 tokens → 13 windows
      "single\nword\nper\nline",
      "a  b   c\nd\te f") ++
      (0 until 100).map(i => (0 to i % 9).map(j => s"w${(i + j) % 23}")
        .mkString(if (i % 3 == 0) "\n" else " "))
    val df = samples.toDF("text")
    for (l <- Seq(1, 3, 8)) {
      // compare per-field arrays (struct equality would trip on field-name
      // type checks): joined strings AND token counts, order included
      val native = call_function("line_structs", col("text"), lit(l))
      val declArr = graft.queries.TextQueries.lineArraysAt(col("text"), l)
      val bad = df.select(
        transform(native, st => st.getField("ls")).as("nls"),
        transform(native, st => st.getField("ntk")).as("nntk"),
        transform(declArr, a => concat_ws(" ", a)).as("dls"),
        transform(declArr, a => size(a)).as("dntk"))
        .filter(col("nls") =!= col("dls") || col("nntk") =!= col("dntk"))
      val badRows = bad.collect()
      assert(badRows.isEmpty,
        s"line_structs diverged at L=$l: ${badRows.take(3).mkString("; ")}")
    }
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
    assert(s2.sql(
      "SELECT word_bigrams(split('a b c', ' '))").head.getSeq[String](0) ==
      Seq("a b", "b c"))
    assert(s2.sql(
      "SELECT line_structs('a b c', 2)").head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getInt(1))) == Seq(("a b", 2), ("c", 1)))
    // idempotent: a second install must not throw or change resolution
    GraftExtensions.registerAll(s2)
    assert(s2.sql("SELECT token_count('x')").head.getInt(0) == 1)
  }
}
