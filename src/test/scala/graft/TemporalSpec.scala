package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence laws for the composed temporal operators: the scalable
  * constructions (union+window as-of, bucket-blocked range join) must equal
  * the naive O(n²) definitions — checked on the sf0.001 tables AND on a
  * hand-built fixture that hits every boundary (equal timestamps, window
  * start/end edges, bucket edges, no-match rows).
  */
class TemporalSpec extends AnyFunSuite {
  import TestSpark._

  private val WindowUs = 600L * 1000000L

  /** Naive as-of: for each purchase, max click ts ≤ purchase ts, then the
    * max event_id at that ts — quadratic, definitionally correct.
    */
  private def naiveAsof(ev: DataFrame): DataFrame = {
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"),
        col("event_id").as("c_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    p.join(c, col("user_id") === col("cu") && col("c_us") <= col("p_us"), "left")
      .groupBy("p_event_id", "user_id", "p_us")
      .agg(max(struct(col("c_us"), col("c_id"))).as("m"))
      .select(col("p_event_id"), col("user_id"), col("p_us"),
        col("m.c_id").as("c_event_id"), col("m.c_us").as("c_us"),
        (col("p_us") - col("m.c_us")).as("gap_us"))
  }

  /** Naive range join: raw inequality predicate (plans a BNLJ — fine for a
    * test oracle, never for production).
    */
  private def naiveRange(ev: DataFrame): DataFrame = {
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id"),
        unix_micros(col("ts")).as("e_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"))
    e.join(c, col("user_id") === col("cu") &&
        col("c_us") >= col("e_us") && col("c_us") < col("e_us") + WindowUs, "left")
      .groupBy("e_id", "user_id", "e_us")
      .agg(sum(when(col("c_us").isNotNull, 1L).otherwise(0L)).as("n_clicks"))
  }

  private def collectSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("as-of join equals the naive definition on real tables") {
    val got = SparkEntry.queries("q83_asof_join")(spark, sf0001)
    assert(collectSet(got) == collectSet(naiveAsof(Tables.load(spark, sf0001, "events"))))
    assert(got.count() > 0)
  }

  test("range join equals the naive definition on real tables") {
    val got = SparkEntry.queries("q84_range_join")(spark, sf0001)
    assert(collectSet(got) == collectSet(naiveRange(Tables.load(spark, sf0001, "events"))))
  }

  test("boundary fixture: ties, window edges, bucket edges, no-match rows") {
    import spark.implicits._
    val base = 1700000000000000L // µs, deliberately NOT bucket-aligned
    val bucketEdge = (base / WindowUs + 1) * WindowUs
    // (event_id, user, type, µs)
    val rows = Seq(
      // user 1: click exactly AT the purchase instant (tie → must match)
      (1L, 1L, "click", base), (2L, 1L, "purchase", base),
      // two clicks at the SAME instant: max event_id must win
      (3L, 1L, "click", base + 50L), (4L, 1L, "click", base + 50L),
      (5L, 1L, "purchase", base + 60L),
      // user 2: purchase BEFORE any click → null match
      (6L, 2L, "purchase", base), (7L, 2L, "click", base + 10L),
      // user 3 range-join edges: error window [base, base+W);
      // click at base (in), base+W-1 (in), base+W (out), crossing a bucket
      // edge in between (bucketEdge lands strictly inside the window)
      (8L, 3L, "error", base),
      (9L, 3L, "click", base), (10L, 3L, "click", base + WindowUs - 1),
      (11L, 3L, "click", base + WindowUs), (12L, 3L, "click", bucketEdge),
      // user 4: error with no clicks at all → n_clicks 0
      (13L, 4L, "error", base))
    val ev = rows.toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-temporal").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val asof = SparkEntry.queries("q83_asof_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(asof(2L).contains(1L), "same-instant click must match")
    assert(asof(5L).contains(4L), "max event_id wins the same-ts tie")
    assert(asof(6L).isEmpty, "no prior click → null match")
    assert(collectSet(SparkEntry.queries("q83_asof_join")(spark, dir)) ==
      collectSet(naiveAsof(Tables.load(spark, dir, "events"))))

    val range = SparkEntry.queries("q84_range_join")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(range(8L) == 3L, "start + end-1 + bucket-edge clicks in; end out")
    assert(range(13L) == 0L, "error with no clicks keeps a zero row")
    assert(collectSet(SparkEntry.queries("q84_range_join")(spark, dir)) ==
      collectSet(naiveRange(Tables.load(spark, dir, "events"))))
  }

  test("random event sets: composed joins equal naive definitions (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // dense user/time spaces force collisions, same-instant ties, windows
    // straddling bucket edges, and empty match sets — the corners the
    // blocking/window constructions must not care about
    val base = 1690000000000000L
    val rowGen = for {
      user <- Gen.choose(1L, 6L)
      tpe <- Gen.oneOf("click", "purchase", "error", "view")
      // offsets cluster around multiples of the 600s window so interval
      // endpoints land on bucket boundaries often
      us <- Gen.oneOf(
        Gen.choose(0L, 3L * WindowUs),
        Gen.choose(0L, 6L).map(_ * WindowUs),
        Gen.choose(0L, 6L).map(_ * WindowUs - 1))
    } yield (user, tpe, base + us)
    val setGen = Gen.listOfN(120, rowGen)
    (0 until 5).foreach { i =>
      val rows = setGen(Gen.Parameters.default, Seed(1234L + i)).get
        .zipWithIndex.map { case ((u, tpe, us), id) => (id.toLong, u, tpe, us) }
      val ev = rows.toDF("event_id", "user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prop$i").toString
      ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
      val loaded = Tables.load(spark, dir, "events")
      assert(collectSet(SparkEntry.queries("q83_asof_join")(spark, dir)) ==
        collectSet(naiveAsof(loaded)), s"as-of law failed for seed ${1234 + i}")
      assert(collectSet(SparkEntry.queries("q84_range_join")(spark, dir)) ==
        collectSet(naiveRange(loaded)), s"range law failed for seed ${1234 + i}")
    }
  }

  test("chunking covers every token exactly and respects stride/size") {
    val rows = SparkEntry.queries("q87_doc_chunking")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // chunks are consecutive from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i && r.getLong(2) == i * 48L)
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 64,
          s"chunk_len out of range: ${r.getLong(3)}")
      }
      // the final chunk reaches the last token: start + len == n_tok,
      // and a doc ≤ 64 tokens is exactly one chunk
      val last = sorted.last
      if (sorted.length == 1) assert(last.getLong(3) <= 64)
      else assert(last.getLong(2) + last.getLong(3) > (sorted.length - 1) * 48L)
    }
  }

  test("mixture weights sum to one and upsample small domains") {
    val rows = SparkEntry.queries("q86_mixture_weights")(spark, sf0001).collect()
    val wsum = rows.map(_.getDouble(4)).sum
    assert(math.abs(wsum - 1.0) < 0.01, s"weights sum to $wsum")
    // temperature < 1 ⇒ the smallest domain is upsampled, the largest down
    val byN = rows.sortBy(_.getLong(2))
    assert(byN.head.getDouble(5) >= 1.0, "smallest domain must upsample")
    assert(byN.last.getDouble(5) <= 1.0, "largest domain must downsample")
  }
}
