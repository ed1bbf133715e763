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
  *    `corpus_splits` (q126 leakage-free split assignment). Their inputs
  *    ride the per-session operator memos (label/signature caches), so the
  *    derived tier reflects the corpus snapshot the session first read —
  *    the same lifetime as every other memoized table; a swapped-in-place
  *    corpus needs a fresh session to re-read.
  *
  * View names are SESSION-global, so the mount state is keyed per session
  * (current (sfDir, prefix)), not per (session, sfDir): asking for a
  * different directory or prefix REPOINTS the views rather than silently
  * no-opping against a stale mount.
  */
object CorpusSurface {

  private val mounted =
    scala.collection.concurrent.TrieMap[SparkSession, (String, String)]()
  Memos.register(s => mounted.remove(s))

  /** Idempotent per (current sfDir, prefix); repoints on any change. */
  def mount(s: SparkSession, sfDir: String, prefix: String = "corpus_"): Unit =
    if (!mounted.get(s).contains((sfDir, prefix))) remount(s, sfDir, prefix)

  /** Force re-registration: repoints the raw `parquet.`-path views and
    * re-pins the derived plans (off the session's operator memos).
    */
  def remount(s: SparkSession, sfDir: String, prefix: String = "corpus_"): Unit = {
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
    mounted(s) = (sfDir, prefix)
  }
}
