package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators (SURVEY.md §7.5 — training-data-pipeline surface).
  *
  * Everything here is built from codegen'd built-ins (split / md5 / conv /
  * higher-order array functions) — no Scala UDFs — so the whole pipeline stays
  * inside WholeStageCodegen and scales linearly with input splits. The hash is
  * deliberately md5-based (not Spark's murmur3 `hash()`) so an external oracle
  * (DuckDB) can reproduce every value bit-for-bit: `hash64` here ==
  * `CAST('0x' || substr(md5(...), 1, 15) AS BIGINT)` in ANSI-ish SQL.
  */
object TextFunctions {

  /** Whitespace tokenization; the canonical token stream for all operators. */
  def toks(text: Column): Column = split(trim(text), "\\s+")

  /** Lowercased, whitespace-collapsed canonical form (exact-dedup key). */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic, oracle-reproducible 60-bit non-negative hash of `c`,
    * parameterized by `seed` (one seed per MinHash permutation). 15 hex chars
    * of md5 → always fits a signed long.
    *
    * Since r18 this routes through the native `hash60` expression
    * ([[Hash60Expression]] — same md5, same 60 bits, one compiled call
    * instead of the concat→md5→substring→conv→cast chain); callers must
    * have `Hash60Expression.register(spark)` run first — `Tables.load`
    * (every sf-dir query's entry) and the streaming routes do. The
    * declarative form stays as [[hash64Decl]], the spec oracle.
    */
  def hash64(c: Column, seed: Int): Column =
    call_function("hash60", c, lit(seed))

  /** The pre-r18 declarative form of [[hash64]] — kept as the property-spec
    * oracle for the native expression (ExpressionSpec pins equality).
    */
  def hash64Decl(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10).cast("long")

  /** SQL rendering of [[hash64]] for the DuckDB oracle. */
  def hash64Sql(expr: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || $expr), 1, 15)) AS BIGINT)"

  /** Word n-gram shingles (distinct), [] when the doc has < n tokens.
    * Native `word_shingles` Catalyst expression (one tight codegen'd loop);
    * callers must `WordShinglesExpression.register(spark)` first — every
    * query module does this at entry. [[shinglesHof]] is the declarative
    * reference form the native kernel is property-tested against.
    */
  def shingles(tokens: Column, n: Int): Column =
    call_function("word_shingles", tokens, lit(n))

  /** Sliding (non-distinct) word bigrams, [] for single-token docs — the
    * phrase stream of the bigram LM (q79), PMI collocations (q160) and the
    * blocklist screens (q103, q108, the streaming gate).
    *
    * Since r19 this routes through the native `word_bigrams` expression
    * ([[WordBigramsExpression]] — same strings, one compiled loop instead
    * of the interpreted transform/element_at chain); callers must have
    * `WordBigramsExpression.register(spark)` run first — `Tables.load`
    * (every sf-dir query's entry) and the streaming routes do.
    * [[bigramsHof]] is the retained declarative reference the spec pins
    * against.
    */
  def bigrams(tokens: Column): Column =
    call_function("word_bigrams", tokens)

  /** The pre-r19 declarative form of [[bigrams]] — kept as the property-
    * spec oracle for the native expression. Guarded: Spark's
    * `sequence(1, 0)` DESCENDS and `element_at(tk, 0)` throws, so the
    * < 2-token case is explicit.
    */
  def bigramsHof(tokens: Column): Column =
    when(size(tokens) >= 2,
      transform(sequence(lit(1), size(tokens) - 1),
        i => concat_ws(" ", element_at(tokens, i), element_at(tokens, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** The q22 quality composite (un-rounded): 0.5·TTR + 0.5·(1 − stopword
    * fraction). Single definition shared by the q22 report, the q108 batch
    * export, and the streaming clean gate so the three can't drift.
    */
  def qualityScore(tokens: Column): Column =
    lit(0.5) * (size(array_distinct(tokens)).cast("double") / size(tokens)) +
      lit(0.5) * (lit(1.0) -
        size(filter(tokens, t => t.isin("the", "a"))).cast("double") / size(tokens))

  /** Built-in higher-order-function form of [[shingles]] — value-identical
    * (same grams, same first-occurrence order; 1-based `slice` mirrors
    * DuckDB's 1-based list slicing) but interpreted per element, so ~6×
    * slower. Kept as the spec oracle for the native expression.
    */
  def shinglesHof(tokens: Column, n: Int): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
}
