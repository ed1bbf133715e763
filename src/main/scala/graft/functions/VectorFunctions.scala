package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<double>` columns, used by the
  * similarity-search and embedding-dedup operators (SURVEY.md §7.5).
  *
  * Built entirely from the higher-order built-ins (`zip_with`, `aggregate`)
  * so the dot products run inside codegen with zero serialization — the
  * same loop an external oracle (DuckDB `list_cosine_similarity` over
  * DOUBLE[]) runs, which keeps results bit-comparable. At 100 TB scale the
  * brute-force form is the per-bucket kernel under an IVF/LSH blocking
  * stage (see SimilarityQueries.q32) — never the whole-corpus plan.
  */
object VectorFunctions {

  /** Elementwise dot product, sequential left-to-right accumulation.
    * Built-in fallback form — see [[dotNative]] for the hot-path version.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** The native `vec_dot` Catalyst expression (no intermediate array, stays
    * in codegen) — requires `DotProductExpression.register(spark)` first.
    * Bit-identical to [[dot]] (same accumulation order).
    */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** The native `vec_dot_i8` integer-dot expression over two
    * `array<tinyint>` columns — the q140 prefilter kernel; requires
    * `Int8DotExpression.register(spark)` first.
    */
  def dotI8Native(a: Column, b: Column): Column =
    call_function("vec_dot_i8", a, b)

  def l2NormNative(a: Column): Column = sqrt(dotNative(a, a))

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cast the parquet `array<float>` embedding to double precision once,
    * before any arithmetic — float accumulation is order-sensitive enough to
    * flip rounded comparisons.
    */
  def asDouble(a: Column): Column = a.cast("array<double>")
}
