package graft.functions

import graft.Lineage.LineageCut

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label propagation —
  * the shared superstep kernel behind near-dup clustering (q65) and
  * common-input address clustering (q74).
  *
  * Scale contract: callers pass only the EDGE SUBGRAPH (nodes that have at
  * least one edge); isolated nodes are singleton components by definition
  * and are cheaper to rejoin afterwards than to drag through supersteps.
  * Each superstep shuffles O(edges).
  *
  * Convergence: labels only ever decrease per node (min of self and
  * neighbors), so a cheap scalar label-sum is monitored per superstep —
  * numeric labels sum exactly (strictly decreasing until fixpoint); string
  * labels (script hashes) sum a 60-bit hex-prefix surrogate that is
  * per-node MONOTONE non-increasing under lexicographic min, so per-node
  * deltas cannot cancel across nodes — an unchanged sum means every node's
  * slice is unchanged. A slice can miss a label change only when old and
  * new label share the 15-char prefix, so when the sum first repeats, the
  * fixpoint is CONFIRMED EXACTLY with one old-vs-new join before the loop
  * exits — the sum is purely an optimization to avoid that join on every
  * superstep, never the correctness authority.
  */
private[graft] object Clustering {

  /** `edges`: two columns `src`,`dst`, already direction-doubled (u→v and
    * v→u). Returns (`node`, `label`) for every node with ≥1 edge, where
    * `label` = min node id of its component (longs or strings).
    */
  def minLabelComponents(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("label", col("node"))
      .cutLineage()
    val isNumeric = edges.schema("src").dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    def sumExpr = {
      val v = if (isNumeric) col("label").cast(DecimalType(38, 0))
      else conv(substring(col("label"), 1, 15), 16, 10).cast(DecimalType(38, 0))
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
        .cutLineage()
      val nextSum = labelSum(next)
      if (nextSum.compareTo(prevSum) == 0) {
        // candidate fixpoint — confirm exactly (both sides checkpointed, so
        // this join is cheap and runs only on candidate supersteps)
        converged = next.as("n")
          .join(labels.withColumnRenamed("label", "prev"), "node")
          .filter(col("label") =!= col("prev"))
          .isEmpty
      }
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
