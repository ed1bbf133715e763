package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScaleGen invariants: the replicated corpus must be BIGGER but not
  * DIFFERENTLY SHAPED — row counts multiply, keys never collide across
  * replicas, referential integrity survives the shifts, and the document/
  * embedding perturbations keep replicas from manufacturing cross-replica
  * dup mass (the artifact that would turn a linear workload quadratic).
  */
class ScaleGenSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft-scalegen").toString
    ScaleGen.generate(spark, sf0001, d, 2)
    d
  }

  test("fact tables multiply, dimensions stay single-copy") {
    def n(dir: String, t: String) = spark.read.parquet(s"$dir/$t.parquet").count()
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(n(dst, t) == 2 * n(sf0001, t), s"$t must double")
    for (t <- Seq("region", "nation"))
      assert(n(dst, t) == n(sf0001, t), s"dim $t must not replicate")
  }

  test("replica keys are disjoint and joins still resolve") {
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    assert(orders.select("o_orderkey").distinct().count() == orders.count(),
      "shifted order keys must stay unique")
    // every lineitem still finds its order (the shift is applied on both
    // sides of the foreign key)
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val dangling = li.join(orders, li("l_orderkey") === orders("o_orderkey"),
      "left_anti").count()
    assert(dangling == 0, s"$dangling lineitems lost their order")
  }

  test("documents are replica-distinct for exact AND near dedup; internal structure kept") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // exact: the canonical fingerprint never collides across replicas, so
    // replication adds zero exact-dup mass
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    val fpCount = docs
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .distinct().count()
    val srcFpCount = src
      .select(md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .distinct().count()
    assert(fpCount == 2 * srcFpCount,
      s"every replica must contribute its own fingerprints ($fpCount vs 2*$srcFpCount)")
    // near: no 3-shingle survives across replicas (per-token suffix rewrites
    // every shingle), so LSH candidate mass scales linearly
    val docStride = {
      val mx = src.agg(max("doc_id")).head().getLong(0)
      var k = 10L; while (k <= mx) k *= 10; k
    }
    val sh = docs.select(explode(graft.functions.TextFunctions.shinglesHof(
      split(trim(col("text")), "\\s+"), 3)).as("g"),
      (col("doc_id") >= docStride).as("rep1"))
    val crossReplica = sh.groupBy("g")
      .agg(countDistinct("rep1").as("reps")).filter(col("reps") > 1).count()
    assert(crossReplica == 0, s"$crossReplica shingles leak across replicas")
    // n_chars stays consistent with the rewritten text
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("zipf mode: counts preserved, wide vocab, injected dup families") {
    val zd = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    ScaleGen.generate(spark, sf0001, zd, 2, zipfVocab = 5000)
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
    val docs = spark.read.parquet(s"$zd/documents.parquet")
    assert(docs.count() == 2 * src.count())
    // ids/lang/source preserved; token count preserved (floor 3)
    val both = docs.select(col("doc_id"), col("lang").as("l2"),
        size(split(trim(col("text")), "\\s+")).as("nt2"))
      .join(src.select(col("doc_id"), col("lang").as("l1"),
        greatest(size(split(trim(col("text")), "\\s+")), lit(3)).as("nt1")),
        "doc_id")
    assert(both.filter(col("l1") =!= col("l2")).count() == 0)
    // ordinal-0/3+ docs keep their exact token count; family members (1, 2)
    // inherit the HEAD's count instead — assert on the non-members
    assert(both.filter(!pmod(col("doc_id"), lit(25L)).isin(1L, 2L) &&
      col("nt1") =!= col("nt2")).count() == 0, "token counts must carry over")
    // vocabulary is Zipf-wide: far beyond the 31-token source vocab
    val vocab = docs.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(countDistinct("t")).head().getLong(0)
    assert(vocab > 1000, s"vocab $vocab too narrow")
    // dup families: ordinal 1 = exact copy of the block head, ordinal 2 =
    // near-dup (identical except the first token)
    val withHead = docs
      .filter(pmod(col("doc_id"), lit(25L)).isin(1L, 2L))
      .select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(25L)).as("o"),
        (col("doc_id") - pmod(col("doc_id"), lit(25L))).as("head"))
      .join(docs.select(col("doc_id").as("head"), col("text").as("htext")),
        "head")
    assert(withHead.filter(col("o") === 1L).count() > 0)
    assert(withHead.filter(col("o") === 1L)
      .filter(col("text") =!= col("htext")).count() == 0,
      "ordinal 1 must be an exact copy of the head")
    val near = withHead.filter(col("o") === 2L)
      .select(regexp_replace(col("text"), lit("^\\S+"), lit("X")).as("a"),
        regexp_replace(col("htext"), lit("^\\S+"), lit("X")).as("b"))
    assert(near.count() > 0 && near.filter(col("a") =!= col("b")).count() == 0,
      "ordinal 2 must differ from the head only in the first token")
  }

  test("embedding noise keeps replicas apart without moving replica 0") {
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
    val srcE = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val stride = {
      var s = 10L
      val mx = srcE.agg(max("vec_id")).head().getLong(0)
      var k = s; while (k <= mx) k *= 10; k
    }
    // replica 0 is byte-identical to the source
    val r0 = e.filter(col("vec_id") < stride)
    assert(r0.exceptAll(srcE).count() == 0 && srcE.exceptAll(r0).count() == 0,
      "replica 0 must be untouched")
    // replica 1 vectors differ from their source counterparts
    val r1 = e.filter(col("vec_id") >= stride)
      .select((col("vec_id") - stride).as("vec_id"), col("embedding").as("e1"))
    val same = r1.join(srcE, "vec_id")
      .filter(col("e1") === col("embedding")).count()
    assert(same == 0, s"$same replica-1 vectors identical to source")
  }
}
