package graft

/** The REALISTIC-VOCABULARY correctness gate (r14 verdict item 3): the
  * text/dedup queries whose behavior genuinely depends on vocabulary
  * shape, re-verified against DuckDB on the 50k-type Zipf(1) corpus
  * (`ScaleGen <src> <dst> <n> 50000`) each round — the 31-token driver
  * corpus distorts exactly this tier (chance-coincidence LSH candidates,
  * degenerate NB classes, trivial frequency heads), so a green driver
  * gate alone cannot protect it.
  *
  * The list is PINNED here (Round15Spec asserts every name exists in
  * `SparkEntry.queries` AND `SparkEntry.oracleSql`) so the committed
  * artifact (`CORRECTNESS_zipf_r{N}.json`) cannot silently narrow.
  * Producing it:
  * {{{
  *   runMain graft.ScaleGen /root/testdata/sf0.01 /tmp/sf001z 1 50000
  *   runMain graft.Verify /tmp/sf001z /tmp/zout <ZipfGate.Queries csv>
  *   python3 tools/oracle_check.py /tmp/sf001z /tmp/zout --json CORRECTNESS_zipf_r{N}.json
  * }}}
  */
object ZipfGate {
  val Queries: Seq[String] = Seq(
    "q25_exact_dedup", "q26_shingle_jaccard", "q27_minhash_lsh",
    "q59_jaccard_lsh_bucketed", "q65_dedup_clusters", "q102_nb_classifier",
    "q106_source_dup_matrix", "q120_containment", "q126_cluster_split",
    "q145_dedup_incremental", "q154_perplexity_thresholds",
    "q155_dedup_attribution", "q156_ngram_diversity", "q159_zipf_slope",
    "q160_pmi_collocations", "q163_source_kl", "q164_dedup_threshold_curve",
    "q167_heaps_law", "q168_token_burstiness")
}
