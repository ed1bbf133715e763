package graft.queries

import graft.chain._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Hard-correctness bridge for the chain domain: dumps the deterministic
  * fixture-derived entity tables (plus the raw fork/backfill fixtures) to
  * parquet at a fixed path so the driver's DuckDB gate can re-execute every
  * chain query as portable SQL over them.
  *
  * The oracle SQL does NOT echo Spark's derived values — it *recomputes* the
  * relational layer independently: cumulative chain stats as SQL window
  * functions, the UTXO set as a NOT EXISTS anti-join, graph edges as
  * join+group+anti-join, fork resolution as a recursive CTE walking parent
  * links from the best tip, and the backfill metrics by `unnest`-ing the raw
  * nested blocks (which independently re-verifies the posexplode flatten).
  * Only JVM-bound scalars (emission schedule, address rendering, sigma
  * register decoding) are taken from the dump as input data — the same trust
  * stance the sf-table oracles take toward the parquet inputs.
  */
object ChainOracle {

  /** Absolute location referenced by the oracle SQL via read_parquet().
    * Resolution: env override → the canonical repo root when present (so
    * Verify and Bench agree regardless of launch cwd, and the dump is
    * OUTSIDE sbt's target dir where a clean can't wipe it between the
    * Verify run and the DuckDB compare) → cwd fallback for foreign
    * checkouts.
    */
  val Dir: String = sys.env.getOrElse("GRAFT_CHAIN_ORACLE_DIR", {
    // resolve THIS checkout's root (nearest ancestor with build.sbt) so
    // Verify and Bench agree regardless of launch cwd, without baking in a
    // host path that could collide with a different checkout.
    @annotation.tailrec
    def findRoot(d: java.io.File): Option[java.io.File] =
      if (new java.io.File(d, "build.sbt").isFile) Some(d)
      else if (d.getParentFile == null) None // don't land on "/"
      else findRoot(d.getParentFile)
    val cwd = new java.io.File(sys.props("user.dir"))
    new java.io.File(findRoot(cwd).getOrElse(cwd), ".graft-oracle").getAbsolutePath
  })

  val BackfillBlocks = 2000

  /** Bump when the fixture generator or the node-JSON decode changes shape:
    * the raw-fixture caches below persist across build rounds keyed only by
    * `_SUCCESS`, so without a version stamp a decode fix would silently
    * keep serving stale conversions.
    */
  val CacheFormatVersion = 2

  private def cacheValid(dir: String): Boolean =
    Files.exists(Paths.get(s"$dir/_SUCCESS")) &&
      scala.util.Try(Files.readString(Paths.get(s"$dir/_graft_cache_version")).trim)
        .toOption.contains(CacheFormatVersion.toString)

  private def stampCache(dir: String): Unit =
    Files.writeString(Paths.get(s"$dir/_graft_cache_version"),
      CacheFormatVersion.toString)

  /** Glob for one dumped table, as DuckDB sees it. */
  def p(name: String): String = s"$Dir/$name/*.parquet"

  private def write(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").parquet(s"$Dir/$name")

  /** Dump the 80-block fixture entity tables + fork headers; idempotent,
    * cheap (the fixture tables are the memoized ones the queries use).
    * Called by Verify before the query loop and by Bench's untimed warmup.
    * `sfDir` (r16 verdict item 5) lets the media_phash dump resolve the
    * CORPUS media table when the dir ships one (the zipf realistic-skew
    * fixture) — the same [[MultimodalQueries.phashSource]] resolution the
    * queries use, so engine and oracle always read identical bytes.
    */
  def dump(s: SparkSession, sfDir: String = ""): Unit = synchronized {
    val t = ChainQueries.fixtureTables(s)
    write(t.blocks, "blocks")
    write(t.txs, "txs")
    write(t.outputs, "outputs")
    write(t.inputs, "inputs")
    write(t.assets, "assets")
    write(t.ergoTrees, "ergo_trees")
    write(t.dataInputs, "data_inputs")
    write(t.registers, "registers")
    write(t.tokens, "tokens")
    // media pipeline outputs: the decode/extract stages are the JVM stub,
    // but their results dumped as parquet let DuckDB recompute the
    // aggregation layer of q42/q43 independently.
    val media = graft.multimodal.MediaFixture.generate(s, MultimodalQueries.MediaRows)
    // the RAW media rows (binary content + typed metadata): DuckDB re-parses
    // the container header straight from the blob (hex + substr), so the
    // decode stage itself is oracle-verified, not echoed (q41/q43).
    write(media.toDF(), "media")
    write(graft.multimodal.MediaFunctions.extractFeatures(media).toDF(), "media_features")
    write(graft.multimodal.MediaFunctions.sampleFrames(media,
      MultimodalQueries.FrameStride).toDF(), "media_frames")
    // the perceptual-hash near-dup source (q170 + q171's phash tier): raw
    // blobs only — the oracle recomputes the dHash byte-by-byte from the
    // luma grid, so the hash kernel AND the Manku banding are verified,
    // not echoed. Corpus-resolved: the zipf media table when present,
    // the deterministic fixture elsewhere.
    write(MultimodalQueries.phashSource(s, sfDir).toDF(), "media_phash")
    // Raw per-block facts for BOTH fork branches: the oracle re-resolves the
    // winner itself (recursive CTE), so ForkResolver is verified, not echoed.
    import s.implicits._
    val (allBlocks, _) = ChainFixture.generateWithFork(
      ChainQueries.ForkAt, ChainQueries.ForkShortLen, ChainQueries.ForkLongLen)
    val forkHeaders = s.createDataset(allBlocks).toDF().select(
      col("header.id").as("blockId"),
      col("header.parentId").as("parentId"),
      col("header.height").as("height"),
      size(col("transactions.transactions")).as("txsCount"),
      aggregate(col("transactions.transactions"), lit(0),
        (acc, tx) => acc + size(tx.getField("outputs"))).as("boxCount"))
    write(forkHeaders, "fork_headers")
    ensureBackfill(s)
  }

  /** Write the 2000-block raw backfill fixture once (outside any timed
    * region — Bench calls this in warmup so q51 measures the engine, not
    * driver-side fixture generation). 16 files so the derivation reads in
    * parallel.
    */
  def ensureBackfill(s: SparkSession): Unit = synchronized {
    if (!cacheValid(s"$Dir/backfill")) {
      import s.implicits._
      s.createDataset(ChainFixture.generate(BackfillBlocks))
        .repartition(16)
        .write.mode("overwrite").parquet(s"$Dir/backfill")
      stampCache(s"$Dir/backfill")
    }
  }

  /** The reference's 4200 canned REAL mainnet blocks as splittable parquet
    * (the source gzip is one stream = one task; the conversion is untimed
    * warehouse population, exactly like [[ensureBackfill]]). Returns None
    * when the reference checkout isn't present.
    */
  /** Reference-checkout root (env-overridable like [[Dir]]); all mainnet
    * fixture paths — blocks, forks, unconfirmed txs — derive from it.
    */
  val ReferenceRoot: String =
    sys.env.getOrElse("GRAFT_REFERENCE_ROOT", "/root/reference")
  val ReferenceResources: String =
    s"$ReferenceRoot/modules/node-pool/src/test/resources"
  val MainnetFixture = s"$ReferenceResources/blocks/blocks.gz"
  def ensureMainnetBackfill(s: SparkSession): Option[String] = synchronized {
    val out = s"$Dir/mainnet-backfill"
    if (cacheValid(out)) Some(out)
    else if (!new java.io.File(MainnetFixture).exists()) None
    else {
      graft.chain.BlockSource.fromNodeJsonLines(s, MainnetFixture)
        .repartition(16)
        .write.mode("overwrite").parquet(out)
      stampCache(out)
      Some(out)
    }
  }

  /** The UTXO set as portable SQL (J5 anti-join, recomputed). */
  private def utxoSql(alias: String): String =
    s"""FROM read_parquet('${p("outputs")}') $alias
        WHERE NOT EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                          WHERE i.boxId = $alias.boxId)"""

  /** The q37/q82 graph-edge construction (input resolution, payback
    * exclusion, dust ≥ 1000000) as a reusable CTE body — shared by the
    * traversal oracles so every graph query verifies against ONE
    * independent edge recomputation.
    */
  private def edgeCteSql: String =
    s"""in_scripts AS (
          SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
          FROM read_parquet('${p("inputs")}') i
          JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
          GROUP BY i.txId, o.ergoTreeHash),
        out_scripts AS (
          SELECT txId, ergoTreeHash, sum(ergValue) AS value
          FROM read_parquet('${p("outputs")}')
          GROUP BY txId, ergoTreeHash),
        edges AS (
          SELECT txId, ergoTreeHash, value FROM in_scripts WHERE value >= 1000000
          UNION ALL
          SELECT o.txId, o.ergoTreeHash, o.value FROM out_scripts o
          WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                            WHERE i.txId = o.txId
                              AND i.ergoTreeHash = o.ergoTreeHash)
            AND o.value >= 1000000)"""

  /** DuckDB oracles for q33–q40 + q51 (chain domain — SURVEY.md §2/§3). */
  val oracles: Map[String, String] = Map(
    // A1–A3/A5/P4: per-block economics from the dump; every cumulative
    // column recomputed as a SQL window over height.
    "q33_chain_blocks" ->
      s"""SELECT height, blockId, parentId, txsCount, blockFee, minerReward,
            blockCoins,
            timestamp - coalesce(lag(timestamp) OVER (ORDER BY height), timestamp)
              AS blockMiningTime,
            CAST(sum(txsCount) OVER w AS BIGINT) AS totalTxsCount,
            CAST(sum(blockFee) OVER w AS BIGINT) AS totalFees,
            totalCoinsIssued,
            CAST(sum(txsCount) OVER w - 1 AS BIGINT) AS maxTxGix,
            CAST(sum(boxCount) OVER w - 1 AS BIGINT) AS maxBoxGix
          FROM read_parquet('${p("blocks")}')
          WINDOW w AS (ORDER BY height ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          ORDER BY height""",

    // J5 + A4-flat: live UTXO grouped by script, anti-join recomputed.
    "q34_chain_utxo" ->
      s"""SELECT o.ergoTreeHash, count(*) AS utxoCount,
            CAST(sum(o.ergValue) AS BIGINT) AS totalValue
          ${utxoSql("o")}
          GROUP BY o.ergoTreeHash ORDER BY o.ergoTreeHash""",

    // SQL-surface routing check: same independent UTXO recomputation as
    // q34, joined with the dumped address dim — the Spark side runs through
    // spark.sql over registered views, so a hash match proves the SQL
    // surface serves exactly what the facade serves.
    "q123_sql_surface" ->
      s"""SELECT d.address, u.ergoTreeHash, count(*) AS utxoCount,
            CAST(sum(u.ergValue) AS BIGINT) AS totalValue
          FROM (SELECT o.* ${utxoSql("o")}) u
          JOIN read_parquet('${p("ergo_trees")}') d ON u.ergoTreeHash = d.hash
          GROUP BY d.address, u.ergoTreeHash
          ORDER BY u.ergoTreeHash""",

    // E1: |any| = |spent| + |unspent| per script.
    "q35_chain_box_lifecycle" ->
      s"""SELECT ergoTreeHash, count(*) AS nAny,
            count(CASE WHEN spent THEN 1 END) AS nSpent,
            count(CASE WHEN NOT spent THEN 1 END) AS nUnspent
          FROM (SELECT o.ergoTreeHash,
                  EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                          WHERE i.boxId = o.boxId) AS spent
                FROM read_parquet('${p("outputs")}') o)
          GROUP BY ergoTreeHash ORDER BY ergoTreeHash""",

    // A7 + P7: top-K scripts by held value, address from the dim dump.
    "q36_chain_top_addresses" ->
      s"""SELECT e.address, u.ergoTreeHash, u.totalValue
          FROM (SELECT o.ergoTreeHash,
                  CAST(sum(o.ergValue) AS BIGINT) AS totalValue
                ${utxoSql("o")}
                GROUP BY o.ergoTreeHash
                ORDER BY totalValue DESC, o.ergoTreeHash LIMIT 10) u
          JOIN read_parquet('${p("ergo_trees")}') e ON u.ergoTreeHash = e.hash
          ORDER BY u.totalValue DESC, u.ergoTreeHash""",

    // J7/J8/P15: edges recomputed — input resolution join, per-(tx,script)
    // sums, payback anti-join, dust filter.
    "q37_chain_tx_graph" ->
      s"""WITH in_scripts AS (
            SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
            GROUP BY i.txId, o.ergoTreeHash),
          out_scripts AS (
            SELECT txId, ergoTreeHash, sum(ergValue) AS value
            FROM read_parquet('${p("outputs")}')
            GROUP BY txId, ergoTreeHash),
          edges AS (
            SELECT 'from' AS direction, value FROM in_scripts
            UNION ALL
            SELECT 'to' AS direction, o.value FROM out_scripts o
            WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                              WHERE i.txId = o.txId
                                AND i.ergoTreeHash = o.ergoTreeHash))
          SELECT direction, count(*) AS nEdges,
            CAST(sum(value) AS BIGINT) AS totalValue
          FROM edges WHERE value >= 1000000
          GROUP BY direction ORDER BY direction""",

    // ST3: fork resolution re-derived — best tip = (max height, min id),
    // recursive walk over parent links, cumulative stats over the winners.
    "q38_chain_fork" ->
      s"""WITH RECURSIVE win AS (
            (SELECT blockId, parentId, height, txsCount, boxCount
             FROM read_parquet('${p("fork_headers")}')
             ORDER BY height DESC, blockId LIMIT 1)
            UNION ALL
            SELECT f.blockId, f.parentId, f.height, f.txsCount, f.boxCount
            FROM read_parquet('${p("fork_headers")}') f
            JOIN win w ON f.blockId = w.parentId)
          SELECT height, blockId,
            CAST(sum(txsCount) OVER w2 AS BIGINT) AS totalTxsCount,
            CAST(sum(boxCount) OVER w2 - 1 AS BIGINT) AS maxBoxGix
          FROM win
          WINDOW w2 AS (ORDER BY height ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          ORDER BY height""",

    // K4 soft delete: orphans = both-branch headers minus the re-resolved
    // winner walk (same recursive CTE as q38).
    "q114_chain_orphans" ->
      s"""WITH RECURSIVE win AS (
            (SELECT blockId, parentId, height
             FROM read_parquet('${p("fork_headers")}')
             ORDER BY height DESC, blockId LIMIT 1)
            UNION ALL
            SELECT f.blockId, f.parentId, f.height
            FROM read_parquet('${p("fork_headers")}') f
            JOIN win w ON f.blockId = w.parentId)
          SELECT f.height, f.blockId, f.parentId, f.txsCount
          FROM read_parquet('${p("fork_headers")}') f
          WHERE f.blockId NOT IN (SELECT blockId FROM win)
          ORDER BY f.height, f.blockId""",

    // P9/P10: minted tokens with EIP-004 props.
    "q39_chain_tokens" ->
      s"""SELECT tokenId, boxId, amount, tokenName, tokenDecimals
          FROM read_parquet('${p("assets")}')
          WHERE minted ORDER BY tokenId""",

    // §3.1 flagship: unspent boxes of one deterministic address (min hash),
    // enriched with block height — anti-join + two dim joins recomputed.
    "q40_chain_boxes_by_address" ->
      s"""WITH target AS (SELECT hash, address
                          FROM read_parquet('${p("ergo_trees")}')
                          ORDER BY hash LIMIT 1)
          SELECT o.boxId, o.txId, o.ergValue, o.settlementHeight,
            t.address, b.height AS blockHeight
          FROM read_parquet('${p("outputs")}') o
          JOIN target t ON o.ergoTreeHash = t.hash
          JOIN read_parquet('${p("blocks")}') b ON o.blockId = b.blockId
          WHERE NOT EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                            WHERE i.boxId = o.boxId)
          ORDER BY o.boxId""",

    // Data inputs resolved against the boxes they reference (read-only
    // context, FullBlockModel.scala:52-58) — the join is recomputed.
    "q60_chain_data_inputs" ->
      s"""SELECT d.txId, d.index, d.boxId, o.ergValue AS refValue,
            o.ergoTreeHash AS refScript, d.height
          FROM read_parquet('${p("data_inputs")}') d
          JOIN read_parquet('${p("outputs")}') o ON d.boxId = o.boxId
          ORDER BY d.txId, d.index""",

    // Register-table roll-up by id and decoded sigma type.
    "q61_chain_registers" ->
      s"""SELECT registerId, sigmaType, count(*) AS n,
            count(DISTINCT boxId) AS nBoxes
          FROM read_parquet('${p("registers")}')
          GROUP BY registerId, sigmaType
          ORDER BY registerId, sigmaType""",

    // Token dim joined back to asset rows: circulating amount per token.
    "q62_chain_tokens_dim" ->
      s"""SELECT t.tokenId, t.tokenName, t.tokenDecimals, t.emissionAmount,
            CAST(sum(a.amount) AS BIGINT) AS circulating, count(*) AS nBoxes
          FROM read_parquet('${p("tokens")}') t
          JOIN read_parquet('${p("assets")}') a ON t.tokenId = a.tokenId
          GROUP BY t.tokenId, t.tokenName, t.tokenDecimals, t.emissionAmount
          ORDER BY t.tokenId""",

    // Common-input-ownership clusters re-derived: star edges from each tx's
    // resolved input scripts, components via a recursive-CTE transitive
    // closure, min label per node — verifying the Spark superstep loop.
    "q74_address_clusters" ->
      s"""WITH RECURSIVE
          ins AS (SELECT DISTINCT i.txId, o.ergoTreeHash
                  FROM read_parquet('${p("inputs")}') i
                  JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId),
          txmin AS (SELECT txId, min(ergoTreeHash) AS m FROM ins GROUP BY txId),
          star AS (SELECT DISTINCT i.ergoTreeHash AS a, t.m AS b
                   FROM ins i JOIN txmin t USING (txId)
                   WHERE i.ergoTreeHash <> t.m),
          edges AS (SELECT a AS s, b AS d FROM star
                    UNION ALL SELECT b, a FROM star),
          nodes AS (SELECT DISTINCT ergoTreeHash FROM read_parquet('${p("outputs")}')),
          reach(node, lbl) AS (
            SELECT ergoTreeHash, ergoTreeHash FROM nodes
            UNION
            SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node),
          lab AS (SELECT node AS ergoTreeHash, min(lbl) AS cluster_id
                  FROM reach GROUP BY 1),
          cs AS (SELECT cluster_id, count(*) AS csize FROM lab GROUP BY 1)
          SELECT lab.ergoTreeHash, lab.cluster_id, cs.csize
          FROM lab JOIN cs USING (cluster_id) ORDER BY ergoTreeHash""",

    // Balance history re-derived: credit/debit ledger union, net per
    // (script, height), running balance as a partitioned SQL window.
    "q75_balance_history" ->
      s"""WITH led AS (
            SELECT ergoTreeHash, settlementHeight AS height,
              CAST(ergValue AS BIGINT) AS delta
            FROM read_parquet('${p("outputs")}')
            UNION ALL
            SELECT o.ergoTreeHash, i.height, -CAST(o.ergValue AS BIGINT)
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId)
          SELECT ergoTreeHash, height, CAST(sum(delta) AS BIGINT) AS net,
            CAST(sum(sum(delta)) OVER (PARTITION BY ergoTreeHash ORDER BY height)
              AS BIGINT) AS balance
          FROM led GROUP BY ergoTreeHash, height
          ORDER BY ergoTreeHash, height""",

    // Point-in-time rich list: the UTXO set AS OF height
    // ${ChainQueries.RichListHeight}, both sides height-pruned.
    "q76_rich_list_at_height" ->
      s"""SELECT o.ergoTreeHash, CAST(sum(o.ergValue) AS BIGINT) AS balance,
            count(*) AS nBoxes
          FROM read_parquet('${p("outputs")}') o
          WHERE o.settlementHeight <= ${ChainQueries.RichListHeight}
            AND NOT EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                            WHERE i.boxId = o.boxId
                              AND i.height <= ${ChainQueries.RichListHeight})
          GROUP BY o.ergoTreeHash
          ORDER BY balance DESC, o.ergoTreeHash LIMIT 10""",

    // Token holder distribution over the live UTXO set: top-3 scripts per
    // token by held amount (window recomputed).
    "q77_token_holders" ->
      s"""SELECT tokenId, ergoTreeHash, held, nBoxes, rnk FROM (
            SELECT h.*, row_number() OVER (
              PARTITION BY tokenId ORDER BY held DESC, ergoTreeHash) AS rnk
            FROM (SELECT a.tokenId, o.ergoTreeHash,
                    CAST(sum(a.amount) AS BIGINT) AS held, count(*) AS nBoxes
                  FROM read_parquet('${p("assets")}') a
                  JOIN read_parquet('${p("outputs")}') o ON a.boxId = o.boxId
                  WHERE NOT EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                                    WHERE i.boxId = o.boxId)
                  GROUP BY a.tokenId, o.ergoTreeHash) h)
          WHERE rnk <= 3 ORDER BY tokenId, rnk""",

    // Script→script flows recomputed from scratch: same input-resolution,
    // payback-exclusion and dust semantics as the q37 oracle, then the
    // per-tx funder × receiver join and the (src, dst) roll-up.
    "q82_chain_flows" ->
      s"""WITH in_scripts AS (
            SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
            GROUP BY i.txId, o.ergoTreeHash),
          out_scripts AS (
            SELECT txId, ergoTreeHash, sum(ergValue) AS value
            FROM read_parquet('${p("outputs")}')
            GROUP BY txId, ergoTreeHash),
          from_e AS (SELECT * FROM in_scripts WHERE value >= 1000000),
          to_e AS (SELECT o.* FROM out_scripts o
            WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                              WHERE i.txId = o.txId
                                AND i.ergoTreeHash = o.ergoTreeHash)
              AND o.value >= 1000000)
          SELECT f.ergoTreeHash AS src, t.ergoTreeHash AS dst,
            count(DISTINCT f.txId) AS nTxs,
            CAST(sum(t.value) AS BIGINT) AS totalValue
          FROM from_e f JOIN to_e t ON f.txId = t.txId
          GROUP BY f.ergoTreeHash, t.ergoTreeHash
          ORDER BY src, dst""",

    // Triangle census recomputed from scratch: the q82 flow-edge CTEs,
    // then the same compact-forward orientation (degree, id) and the
    // wedge + closing-edge joins.
    "q150_graph_triangles" ->
      s"""WITH in_scripts AS (
            SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
            GROUP BY i.txId, o.ergoTreeHash),
          out_scripts AS (
            SELECT txId, ergoTreeHash, sum(ergValue) AS value
            FROM read_parquet('${p("outputs")}')
            GROUP BY txId, ergoTreeHash),
          from_e AS (SELECT * FROM in_scripts WHERE value >= 1000000),
          to_e AS (SELECT o.* FROM out_scripts o
            WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                              WHERE i.txId = o.txId
                                AND i.ergoTreeHash = o.ergoTreeHash)
              AND o.value >= 1000000),
          und AS (SELECT DISTINCT
              least(f.ergoTreeHash, t.ergoTreeHash) AS a,
              greatest(f.ergoTreeHash, t.ergoTreeHash) AS b
            FROM from_e f JOIN to_e t ON f.txId = t.txId
            WHERE f.ergoTreeHash <> t.ergoTreeHash),
          deg AS (SELECT v, count(*) AS d FROM (
              SELECT a AS v FROM und UNION ALL SELECT b FROM und)
            GROUP BY v),
          ori AS (SELECT
              CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND und.a < und.b)
                   THEN und.a ELSE und.b END AS u,
              CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND und.a < und.b)
                   THEN und.b ELSE und.a END AS w
            FROM und
            JOIN deg dx ON dx.v = und.a
            JOIN deg dy ON dy.v = und.b),
          wedges AS (SELECT x.w AS a, y.w AS b, x.u AS apex
            FROM ori x JOIN ori y ON x.u = y.u AND x.w < y.w),
          tri AS (SELECT apex, a, b FROM wedges JOIN und USING (a, b)),
          pv AS (SELECT unnest([apex, a, b]) AS script FROM tri)
          SELECT script, count(*) AS nTriangles
          FROM pv GROUP BY script
          ORDER BY nTriangles DESC, script LIMIT 10""",

    // Exact heavy hitters recomputed directly — verifying that the
    // sketch-then-recount pipeline loses nothing above the bar.
    "q81_hot_scripts_sketch" ->
      s"""SELECT ergoTreeHash, count(*) AS n
          FROM read_parquet('${p("outputs")}')
          GROUP BY ergoTreeHash
          HAVING count(*) * ${ChainQueries.HotK} >
            (SELECT count(*) FROM read_parquet('${p("outputs")}'))
          ORDER BY ergoTreeHash""",

    // Coin-blocks destroyed: spend resolution join + age weighting,
    // recomputed from the raw input/output dumps.
    "q88_coin_blocks_destroyed" ->
      s"""SELECT i.height // 16 AS epoch, count(*) AS nSpends,
            CAST(sum(o.ergValue * (i.height - o.settlementHeight)) AS BIGINT)
              AS coinBlocksDestroyed,
            max(i.height - o.settlementHeight) AS maxAge
          FROM read_parquet('${p("inputs")}') i
          JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
          GROUP BY 1 ORDER BY epoch""",

    // Live-UTXO age distribution at the tip (HODL waves): anti-join + age
    // bucketing recomputed.
    "q89_utxo_age" ->
      s"""WITH tip AS (SELECT max(height) AS h FROM read_parquet('${p("blocks")}'))
          SELECT (tip.h - o.settlementHeight) // 16 AS ageBucket,
            count(*) AS nBoxes, CAST(sum(o.ergValue) AS BIGINT) AS totalValue
          FROM read_parquet('${p("outputs")}') o, tip
          WHERE NOT EXISTS (SELECT 1 FROM read_parquet('${p("inputs")}') i
                            WHERE i.boxId = o.boxId)
          GROUP BY 1 ORDER BY ageBucket""",

    // Graph traversals re-derived: the same q37 edge construction, the
    // busiest-script target, then the 1-hop / capped 2-hop joins.
    "q92_neighbours" ->
      s"""WITH $edgeCteSql,
          tgt AS (SELECT ergoTreeHash AS target FROM edges
                  GROUP BY 1 ORDER BY count(*) DESC, ergoTreeHash LIMIT 1),
          mine AS (SELECT e.txId FROM edges e
                   JOIN tgt ON e.ergoTreeHash = tgt.target)
          SELECT e2.ergoTreeHash, count(*) AS sharedTxs,
            CAST(sum(e2.value) AS BIGINT) AS totalValue
          FROM edges e2 JOIN mine USING (txId), tgt
          WHERE e2.ergoTreeHash <> tgt.target
          GROUP BY 1 ORDER BY sharedTxs DESC, e2.ergoTreeHash""",
    "q93_two_hop" ->
      s"""WITH $edgeCteSql,
          tgt AS (SELECT ergoTreeHash AS target FROM edges
                  GROUP BY 1 ORDER BY count(*) DESC, ergoTreeHash LIMIT 1),
          mine AS (SELECT e.txId FROM edges e
                   JOIN tgt ON e.ergoTreeHash = tgt.target),
          hop1 AS (SELECT e2.ergoTreeHash AS mid, count(*) AS st
                   FROM edges e2 JOIN mine USING (txId), tgt
                   WHERE e2.ergoTreeHash <> tgt.target
                   GROUP BY 1 ORDER BY st DESC, mid LIMIT 100),
          midTxs AS (SELECT e.txId, h.mid FROM edges e
                     JOIN hop1 h ON e.ergoTreeHash = h.mid)
          SELECT e2.ergoTreeHash, count(DISTINCT m.mid) AS nPaths,
            CAST(sum(e2.value) AS BIGINT) AS totalValue
          FROM edges e2 JOIN midTxs m USING (txId), tgt
          WHERE e2.ergoTreeHash <> tgt.target AND e2.ergoTreeHash <> m.mid
          GROUP BY 1 ORDER BY nPaths DESC, e2.ergoTreeHash""",

    // PageRank re-derived with UNROLLED power iterations (3 CTE rounds):
    // the flow-edge CTE is the same recomputation q82 uses; each round
    // recomputes dangling mass, in-contributions, and the damped update.
    "q91_script_pagerank" -> {
      val iterCtes = (1 to 3).map { i =>
        val prev = s"pr${i - 1}"
        s"""d$i AS (SELECT coalesce(sum(pr), 0) AS dm FROM $prev
                    WHERE node NOT IN (SELECT src FROM outw)),
            c$i AS (SELECT en.dst AS node, sum(en.p * $prev.pr) AS cin
                    FROM en JOIN $prev ON en.src = $prev.node GROUP BY 1),
            pr$i AS (SELECT nodes.node,
                       0.15 / nt.n + 0.85 * (coalesce(c$i.cin, 0) + d$i.dm / nt.n) AS pr
                     FROM nodes LEFT JOIN c$i USING (node), d$i, nt)"""
      }.mkString(",\n")
      s"""WITH in_scripts AS (
            SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
            GROUP BY i.txId, o.ergoTreeHash),
          out_scripts AS (
            SELECT txId, ergoTreeHash, sum(ergValue) AS value
            FROM read_parquet('${p("outputs")}')
            GROUP BY txId, ergoTreeHash),
          from_e AS (SELECT * FROM in_scripts WHERE value >= 1000000),
          to_e AS (SELECT o.* FROM out_scripts o
            WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                              WHERE i.txId = o.txId
                                AND i.ergoTreeHash = o.ergoTreeHash)
              AND o.value >= 1000000),
          fl AS (SELECT f.ergoTreeHash AS src, t.ergoTreeHash AS dst,
                   CAST(sum(t.value) AS DOUBLE) AS w
                 FROM from_e f JOIN to_e t ON f.txId = t.txId GROUP BY 1, 2),
          outw AS (SELECT src, sum(w) AS ow FROM fl GROUP BY 1),
          en AS (SELECT src, dst, w / ow AS p FROM fl JOIN outw USING (src)),
          nodes AS (SELECT DISTINCT ergoTreeHash AS node
                    FROM read_parquet('${p("outputs")}')),
          nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
          pr0 AS (SELECT node, 1.0 / nt.n AS pr FROM nodes, nt),
          $iterCtes
          SELECT node AS ergoTreeHash, round(pr, 6) AS pagerank
          FROM pr3 ORDER BY ergoTreeHash"""
    },

    // Taint propagation re-derived with UNROLLED supersteps (3 CTE
    // rounds) over the same independent flow-edge recomputation as q91:
    // forwarded mass = Σ p·taint into each dst, sinks retain, rounds sum.
    "q138_taint_flow" -> {
      val stepCtes = (1 to 3).map { i =>
        val prev = s"t${i - 1}"
        s"""f$i AS (SELECT en.dst AS node, sum(en.p * $prev.tn) AS tn
                    FROM en JOIN $prev ON en.src = $prev.node GROUP BY 1),
            r$i AS (SELECT node, tn FROM $prev
                    WHERE node NOT IN (SELECT src FROM outw)),
            t$i AS (SELECT node, sum(tn) AS tn FROM
                      (SELECT * FROM f$i UNION ALL SELECT * FROM r$i)
                    GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH in_scripts AS (
            SELECT i.txId, o.ergoTreeHash, sum(o.ergValue) AS value
            FROM read_parquet('${p("inputs")}') i
            JOIN read_parquet('${p("outputs")}') o ON i.boxId = o.boxId
            GROUP BY i.txId, o.ergoTreeHash),
          out_scripts AS (
            SELECT txId, ergoTreeHash, sum(ergValue) AS value
            FROM read_parquet('${p("outputs")}')
            GROUP BY txId, ergoTreeHash),
          from_e AS (SELECT * FROM in_scripts WHERE value >= 1000000),
          to_e AS (SELECT o.* FROM out_scripts o
            WHERE NOT EXISTS (SELECT 1 FROM in_scripts i
                              WHERE i.txId = o.txId
                                AND i.ergoTreeHash = o.ergoTreeHash)
              AND o.value >= 1000000),
          fl AS (SELECT f.ergoTreeHash AS src, t.ergoTreeHash AS dst,
                   CAST(sum(t.value) AS DOUBLE) AS w
                 FROM from_e f JOIN to_e t ON f.txId = t.txId GROUP BY 1, 2),
          outw AS (SELECT src, sum(w) AS ow FROM fl GROUP BY 1),
          en AS (SELECT src, dst, w / ow AS p FROM fl JOIN outw USING (src)),
          t0 AS (SELECT src AS node, 1.0 AS tn FROM outw
                 ORDER BY ow DESC, src LIMIT 1),
          $stepCtes
          SELECT node AS ergoTreeHash, round(tn, 6) AS taint
          FROM t3 WHERE round(tn, 6) > 0 ORDER BY ergoTreeHash"""
    },

    // The warehouse's base+delta UTXO view, row-level, against the plain
    // relational anti-join — verifies the MVCC versioning (compacted base +
    // live deltas) reconstructs exactly the unspent set.
    "q94_wh_utxo_view" ->
      s"""SELECT o.boxId, o.txId, o.blockId, o.settlementHeight, o.ergValue,
            o.ergoTreeHash
          ${utxoSql("o")}
          ORDER BY o.boxId""",

    // The partition-pruned range scan against an unpruned recomputation of
    // the same height range over the full dump.
    "q95_wh_range_scan" ->
      s"""SELECT height, blockId, txsCount, blockFee, totalTxsCount, maxBoxGix
          FROM read_parquet('${p("blocks")}')
          WHERE height BETWEEN ${ChainQueries.RangeScanFrom}
            AND ${ChainQueries.RangeScanTo}
          ORDER BY height""",

    // Backfill result re-derived from the RAW nested blocks: unnest replays
    // the flatten, NOT EXISTS replays the UTXO anti-join.
    "q51_chain_backfill" ->
      s"""WITH b AS (SELECT header.height AS height,
                       transactions.transactions AS txs
                     FROM read_parquet('${p("backfill")}')),
          tx AS (SELECT height, unnest(txs) AS t FROM b),
          outs AS (SELECT unnest(t.outputs) AS o FROM tx),
          ins AS (SELECT unnest(t.inputs) AS i FROM tx)
          SELECT (SELECT max(height) FROM b) AS tipHeight,
                 (SELECT count(*) - 1 FROM outs) AS maxBoxGix,
                 (SELECT count(*) FROM outs o
                  WHERE NOT EXISTS (SELECT 1 FROM ins
                                    WHERE ins.i.boxId = o.o.boxId)) AS utxoCount,
                 (SELECT count(*) FROM outs) AS boxCount"""
  )
}
