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
  * Usage: runMain graft.ScaleGen <srcSfDir> <dstDir> <replicas>
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcSfDir> <dstDir> <replicas>")
    val Array(src, dst, nStr) = args
    val n = nStr.toInt
    require(n >= 1, s"replicas must be >= 1, got $n")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, dst, n)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
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
    write("documents", rep(read("documents")) { (df, r) =>
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
    println(s"[scalegen] done: $dst = $src x$n")
  }
}
