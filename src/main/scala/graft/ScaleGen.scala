package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scale-proof bench run: replicates the driver's
  * sf0.1 tables N× with replica-shifted keys so a 10× corpus exercises 10×
  * rows under the SAME workload shape — join fan-outs, dup-group sizes, and
  * near-dup candidate mass all scale linearly, as real corpus growth would.
  *
  * Two deliberate perturbations keep replication from manufacturing
  * quadratic artifacts that no real corpus has:
  *   - document text gets a per-replica suffix on EVERY token, so replicas
  *     are neither exact dups (md5 fingerprint) nor near-dups (every shingle
  *     differs) of each other, while each replica's INTERNAL dup/near-dup
  *     structure stays byte-for-byte the sf0.1 structure;
  *   - embedding components get deterministic ±10% noise keyed by
  *     (vec_id, position), so cross-replica cosine collapses below any
  *     near-dup threshold while each replica keeps sf0.1's geometry.
  * Dimension tables (region/nation) stay single-copy, as in TPC-H scaling.
  *
  * REALISTIC-VOCABULARY mode (r13 verdict item 5): the driver corpus's
  * 31-token vocabulary is the binding constraint on measurement fidelity —
  * it degenerates the NB classifier to majority-class, makes the Zipf/PMI
  * heads trivially small, and gives MinHash bands an unrealistically dense
  * candidate graph. With a 4th argument V > 0, `documents.text` is
  * REGENERATED instead of replica-suffixed: every doc keeps its id, lang,
  * source, and token COUNT, but draws tokens from a V-type vocabulary
  * with a Zipf(1) rank-frequency law (rank = ⌊exp(u·ln V)⌋ over a
  * deterministic per-(doc, position) hash — log-uniform IS Zipf s=1), with
  * the head ROTATED per source so sources genuinely diverge (KL > 0,
  * distinct slopes), and with controlled dup structure injected: in every
  * block of [[FamMod]] ids, ordinal 1 is an exact copy of the block head
  * and ordinal 2 a near-dup (first token replaced — J ≈ (nt−2)/(nt+2) on
  * distinct shingles, well above the 0.5 near-dup cut for typical doc
  * lengths). Everything is hash-derived — stable under retries, never
  * rand().
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <dstDir> <replicas> [zipfVocab]
  */
object ScaleGen {

  /** Zipf mode: dup-family block size (ordinal 1 = exact, 2 = near dup). */
  private val FamMod = 25

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: ScaleGen <srcSfDir> <dstDir> <replicas> [zipfVocab]")
    val Array(src, dst, nStr) = args.take(3)
    val n = nStr.toInt
    val zipfV = args.drop(3).headOption.map(_.toInt).getOrElse(0)
    require(n >= 1, s"replicas must be >= 1, got $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, dst, n, zipfV)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, n: Int,
    zipfVocab: Int = 0): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // key strides: one power-of-ten above each table's max key, so shifted
    // keys never collide across replicas and stay eyeball-decodable
    def stride(df: DataFrame, key: String): Long = {
      val mx = df.agg(max(col(key).cast("long"))).head().getLong(0)
      var s = 10L
      while (s <= mx) s *= 10
      s
    }

    val custS = stride(read("customer"), "c_custkey")
    val ordS = stride(read("orders"), "o_orderkey")
    val partS = stride(read("part"), "p_partkey")
    val suppS = stride(read("supplier"), "s_suppkey")
    val evS = stride(read("events"), "event_id")
    val userS = stride(read("events"), "user_id")
    val docS = stride(read("documents"), "doc_id")
    val vecS = stride(read("embeddings"), "vec_id")

    // replicate df N times applying per-replica column rewrites
    def rep(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(r => shift(df, r)).reduce(_ unionByName _)

    def shifted(r: Int, s: Long)(c: String) = (col(c) + lit(r * s)).as(c)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions: single copy
    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", rep(read("customer")) { (df, r) =>
      df.select(shifted(r, custS)("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    })
    write("supplier", rep(read("supplier")) { (df, r) =>
      df.select(shifted(r, suppS)("s_suppkey"), col("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    })
    write("part", rep(read("part")) { (df, r) =>
      df.select(shifted(r, partS)("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))
    })
    write("orders", rep(read("orders")) { (df, r) =>
      df.select(shifted(r, ordS)("o_orderkey"), shifted(r, custS)("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    })
    write("lineitem", rep(read("lineitem")) { (df, r) =>
      df.select(shifted(r, ordS)("l_orderkey"), shifted(r, partS)("l_partkey"),
        shifted(r, suppS)("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    })
    write("events", rep(read("events")) { (df, r) =>
      df.select(shifted(r, evS)("event_id"), col("ts"),
        shifted(r, userS)("user_id"), col("event_type"), col("value"),
        col("props"))
    })
    if (zipfVocab > 0) {
      val base = rep(read("documents")) { (df, r) =>
        df.select(shifted(r, docS)("doc_id"), col("text"), col("lang"),
          col("source"))
      }
      write("documents", zipfRewrite(base, zipfVocab))
      // REALISTIC-SKEW media table (r16 verdict item 5): the driver's
      // media fixture is sha256-derived at every scale — no degenerate
      // keys, no hot Hamming blocks — so the phash tier was never gated
      // on the skew it exists to guard. The zipf corpus ships one:
      // the standard near-dup family structure scaled linearly, PLUS a
      // linear population of TRUE-FLAT images (dHash 0 — the quarantined
      // class a real crawl's placeholder/separator images form), PLUS a
      // FIXED 12-image near-flat class (dHash values 1..12: one hot
      // block-0 bucket, seven all-zero blocks — the realistic hot-bucket
      // shape; bounded like an eval suite so the pair mass stays
      // constant). q170 and q171's phash tier read this table when
      // present (fixture fallback elsewhere), so the quarantine rule and
      // the block-occupancy audit are value-verified under real skew.
      write("media_phash", zipfMedia(spark, n))
    } else write("documents", rep(read("documents")) { (df, r) =>
      // suffix every token with the replica ordinal: same token count, all
      // shingles/fingerprints replica-distinct; n_chars re-derived to stay
      // consistent with the rewritten text
      val t = regexp_replace(col("text"), "(\\S+)", "$1" + r.toString)
      df.select(shifted(r, docS)("doc_id"), t.as("text"), col("lang"),
        col("source"), length(t).cast("long").as("n_chars"))
    })
    write("embeddings", rep(read("embeddings")) { (df, r) =>
      // deterministic per-(id, position, replica) multiplicative noise in
      // [0.9, 1.1): breaks cross-replica cosine ~1.0 without moving the
      // replica-internal distribution
      val noisy =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x * (lit(0.9) + (pmod(hash(col("vec_id"), i, lit(r)).cast("long"), lit(1000L))
            .cast("double") / lit(5000.0)))).cast("float"))
      df.select(shifted(r, vecS)("vec_id"), noisy.as("embedding"), col("label"))
    })
    println(s"[scalegen] done: $dst = $src x$n" +
      (if (zipfVocab > 0) s" (zipf vocab $zipfVocab)" else ""))
  }

  /** A GRFT image whose dHash is EXACTLY `target`: row r starts at luma
    * 100 and each of the 8 comparisons steps +5 (bit set: next > cur) or
    * −5 (clear) following the target's bit (r·8 + c) — the inverse of
    * [[graft.multimodal.MediaFunctions.dHash]]'s grid walk, range-safe
    * ([60, 140] ⊂ byte).
    */
  private[graft] def grftWithHash(id: Long, target: Long): graft.multimodal.MediaRow = {
    val b = java.nio.ByteBuffer.allocate(13 + 72)
    b.put("GRFT".getBytes("US-ASCII")); b.put(1.toByte)
    b.putInt(64); b.putInt(48)
    (0 until 8).foreach { r =>
      var cur = 100
      b.put(cur.toByte)
      (0 until 8).foreach { c =>
        cur += (if (((target >> (r * 8 + c)) & 1L) == 1L) 5 else -5)
        b.put(cur.toByte)
      }
    }
    graft.multimodal.MediaRow(id, "image", b.array(),
      graft.multimodal.MediaMeta("x-graft/image", 64, 48, -1, -1))
  }

  /** The zipf-mode media table: `PhashRows`·n family-structured images
    * (the fixture generator, scaled linearly), 10% true-flat degenerates
    * (ids from 10 000 000), and the fixed 12-image near-flat class (ids
    * from 20 000 000, dHash = 1..12 — pairwise Hamming ≤ 4, one hot
    * block-0 bucket). All GRFT, all hash-derived — the DuckDB oracle
    * recomputes every dHash bit from the raw bytes.
    */
  private[graft] def zipfMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val baseN = graft.queries.MultimodalQueries.PhashRows * n
    val base = graft.multimodal.MediaFixture.generatePhash(spark, baseN)
    val flats = spark.range(baseN / 10).map(i =>
      grftWithHash(10000000L + i, 0L))
    val nearFlats = spark.range(12).map(i =>
      grftWithHash(20000000L + i, i + 1))
    base.union(flats).union(nearFlats).toDF()
  }

  /** Zipf-vocabulary text regeneration (see the object note): one pass
    * generates every doc's base text from deterministic per-(doc_id,
    * position) hash draws; one self-join on the family head injects the
    * exact/near-dup ordinals. All map-side arithmetic plus one keyed join —
    * scales to any replica count.
    */
  private[graft] def zipfRewrite(base: DataFrame, v: Int): DataFrame = {
    // token count preserved from the source doc (floor 3 so every doc
    // shingles); the draw: rank = ⌊exp(u·ln(V+1))⌋ − 1 ∈ [0, V−1] — the
    // −1 maps the floor's natural range onto ranks starting at 0 so rank
    // 0 (the Zipf(1) head) is drawn (r14 ADVICE), and the log base is
    // V+1, not V, so the TOP rank V−1 is reachable too and every source's
    // rotated vocabulary covers all V types (r15 ADVICE: with ln V the
    // floor tops out at V−1 pre-shift, leaving one unreachable type per
    // source). u ∈ (0,1) from a 1e-6 grid over murmur(doc_id, pos, seed);
    // per-source head rotation via a source-hash offset. The least()
    // clamp is a guard only — u < 1 already bounds the floor at V.
    val nt = greatest(size(split(trim(col("text")), "\\s+")), lit(3))
    val gen = base.withColumn("gtext",
      concat_ws(" ", transform(sequence(lit(1), nt), p => {
        val u = (pmod(hash(col("doc_id"), p, lit(77)).cast("long"),
          lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
        val rank = least(lit(v - 1),
          floor(exp(u * log(lit(v.toDouble + 1.0)))).cast("int") - 1)
        val rot = pmod(rank + pmod(hash(col("source")), lit(97)), lit(v))
        format_string("w%05d", rot)
      })))
    val g = gen.select(col("doc_id"), col("gtext"), col("lang"), col("source"))
    val ord = pmod(col("doc_id"), lit(FamMod.toLong))
    val members = g.filter(ord.isin(1L, 2L))
      .select(col("doc_id"), col("lang"), col("source"), col("gtext"),
        ord.as("o"), (col("doc_id") - ord).as("head"))
      // LEFT join: a member whose block head id does not exist (sparse id
      // range) keeps its own generated text instead of vanishing
      .join(g.select(col("doc_id").as("head"), col("gtext").as("htext")),
        Seq("head"), "left")
      .select(col("doc_id"), col("lang"), col("source"),
        when(col("htext").isNull, col("gtext"))
          .when(col("o") === 1L, col("htext"))
          .otherwise(regexp_replace(col("htext"), lit("^\\S+"),
            concat(lit("nd"), pmod(col("doc_id"), lit(100L))))).as("text"))
    val rest = g.filter(!ord.isin(1L, 2L))
      .select(col("doc_id"), col("lang"), col("source"), col("gtext").as("text"))
    rest.unionByName(members)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
  }
}
