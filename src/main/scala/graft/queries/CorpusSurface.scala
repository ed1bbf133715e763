package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** The corpus-pipeline SQL surface — the LLM-data analog of
  * `GraftEngine.registerViews` (the chain-warehouse surface, itself the
  * Spark-native form of the reference's REST endpoint set,
  * modules/backend/.../TapirRoutes.scala:24-68): mount once per session,
  * then any SQL user (JDBC/Thrift server, notebook, `spark.sql`) reads the
  * raw corpus AND the derived pipeline verdict tables with plain SQL, no
  * Scala facade.
  *
  * Freshness model mirrors the warehouse surface's two tiers:
  *  - `corpus_documents` / `corpus_embeddings` are SQL-text views over
  *    `parquet.` paths — re-resolved (fresh file listing) on every query;
  *  - the derived tables are pinned plans built from the SAME operator
  *    definitions the DuckDB oracle gate hash-verifies: `corpus_dup_labels`
  *    (q65 component labels), `corpus_clean` (q108 keep/reason verdicts),
  *    `corpus_splits` (q126 leakage-free split assignment). Re-mount
  *    (cheap) to advance the pin after a corpus refresh.
  */
object CorpusSurface {

  private val mounted =
    scala.collection.concurrent.TrieMap[(SparkSession, String), Boolean]()
  Memos.register(s => mounted.keys.filter(_._1 eq s).foreach(mounted.remove))

  def mount(s: SparkSession, sfDir: String, prefix: String = "corpus_"): Unit =
    mounted.getOrElseUpdate((s, sfDir), {
      Memos.hook(s)
      Seq("documents", "embeddings").foreach { n =>
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $prefix$n AS " +
          s"SELECT * FROM parquet.`$sfDir/$n.parquet`")
      }
      Seq(
        "dup_labels" -> SparkEntry.queries("q65_dedup_clusters")(s, sfDir),
        "clean" -> SparkEntry.queries("q108_clean_export")(s, sfDir),
        "splits" -> SparkEntry.queries("q126_cluster_split")(s, sfDir)
      ).foreach { case (n, df) => df.createOrReplaceTempView(prefix + n) }
      true
    })
}
