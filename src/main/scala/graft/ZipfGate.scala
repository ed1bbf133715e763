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
  /** Round 16 (r15 verdict item 6) widened the tier to the full dedup
    * family: the simhash pairing (q29 — sign votes over shingle hashes
    * are exactly what a degenerate vocabulary distorts), the substring/
    * containment pair q98/q120, the line-level dedup+filter surfaces
    * (q142/q158/q162), and the cluster-leakage audit q110. Round 17
    * (r16 verdict item 5) adds q170: the zipf corpus ships a
    * realistic-skew media table (ScaleGen.zipfMedia — a true-flat
    * degenerate class, a hot near-flat Hamming-block class), so the
    * phash pairing AND its quarantine rule are value-verified under the
    * skew they exist to guard (q171's phash tier rides the same table).
    * Round 18 (r17 verdict item 3) pins the VECTOR tier: the hash
    * embedder (q139) derives its vectors from text, so realistic
    * vocabulary genuinely shapes the embedding stack — q139/q140 plus
    * the ANN pair tail q129 and its served twin q130 (all four verified
    * resolving and green on the zipf corpus before joining the list).
    */
  val Queries: Seq[String] = Seq(
    "q129_ivf2_neardup", "q130_ann_serve",
    "q139_hash_embed", "q140_semantic_src_matrix",
    "q170_image_phash_pairs",
    "q25_exact_dedup", "q26_shingle_jaccard", "q27_minhash_lsh",
    "q29_simhash_pairs", "q59_jaccard_lsh_bucketed", "q65_dedup_clusters",
    "q98_substring_dup", "q102_nb_classifier",
    "q106_source_dup_matrix", "q110_split_leakage", "q120_containment",
    "q126_cluster_split", "q142_line_dedup",
    "q145_dedup_incremental", "q154_perplexity_thresholds",
    "q155_dedup_attribution", "q156_ngram_diversity", "q158_line_filter",
    "q159_zipf_slope",
    "q160_pmi_collocations", "q162_split_line_leakage", "q163_source_kl",
    "q164_dedup_threshold_curve", "q167_heaps_law", "q168_token_burstiness",
    "q171_hamming_skew_audit")
}
