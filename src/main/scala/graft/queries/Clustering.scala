package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label propagation —
  * the shared superstep kernel behind near-dup clustering (q65) and
  * common-input address clustering (q74).
  *
  * Scale contract: callers pass only the EDGE SUBGRAPH (nodes that have at
  * least one edge); isolated nodes are singleton components by definition
  * and are cheaper to rejoin afterwards than to drag through supersteps.
  * Each superstep shuffles O(edges); convergence is detected by the
  * label-sum invariant (labels only ever decrease to the component min, so
  * the sum strictly decreases until fixpoint — one scalar aggregate per
  * superstep instead of a joined old-vs-new comparison).
  */
private[queries] object Clustering {

  /** `edges`: two columns `src`,`dst`, already direction-doubled (u→v and
    * v→u). Returns (`node`, `label`) for every node with ≥1 edge, where
    * `label` = min node id of its component. Labels are orderable values
    * (long or string); the decimal convergence sum uses a stable surrogate
    * (dense hash) when labels are strings.
    */
  def minLabelComponents(edges: DataFrame, s: SparkSession, maxIter: Int = 64): DataFrame = {
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    // label-sum convergence surrogate: numeric labels sum directly (strictly
    // decreasing until fixpoint). String labels (script hashes) sum two
    // 60-bit slices — one from each end of the hex — so an undetected change
    // needs two distinct hashes agreeing on BOTH ends (2^-120): the prefix
    // slice alone is only non-strictly monotone under lexicographic min.
    val isNumeric = edges.schema("src").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    def sumExpr = {
      val v = if (isNumeric) col("label").cast(DecimalType(38, 0))
      else (conv(substring(col("label"), 1, 15), 16, 10).cast(DecimalType(38, 0)) +
        conv(substring(col("label"), -15, 15), 16, 10).cast(DecimalType(38, 0)))
      sum(v)
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sumExpr).head.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val prop = edges.join(labels, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"))
      val next = labels.unionByName(prop)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    // a component whose diameter exceeds the cap would silently mislabel —
    // fail loudly instead (64 supersteps covers any realistic co-spend or
    // dup chain; if ever hit, switch to small-star/large-star contraction).
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge after $iter supersteps")
    labels
  }
}
