package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SCRATCH interleaved A/B harness for the round-19 optimization claims —
  * both forms alternate inside ONE JVM (min-of-k), so box drift cannot fake
  * a win. Deleted before close (the r17 temporary-mains rule); the numbers
  * land in OPTIMIZATION_r19.md.
  *
  * Usage: runMain graft.AbR19 <sfDir> <exp1,exp2,...> [reps]
  * Experiments: q129tail, q91, q138, q150, q80
  */
object AbR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val exps = args(1).split(",").toSet
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ab(label: String)(a: => Unit)(b: => Unit): Unit = {
      a; b // warm both (codegen, fixture caches)
      val ta = new Array[Double](reps)
      val tb = new Array[Double](reps)
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime(); a
        val t1 = System.nanoTime(); b
        val t2 = System.nanoTime()
        ta(i) = (t1 - t0) / 1e9; tb(i) = (t2 - t1) / 1e9
        i += 1
      }
      def mm(xs: Array[Double]) =
        f"min ${xs.min}%6.2f med ${xs.sorted.apply(reps / 2)}%6.2f"
      println(f"[ab] $label%-12s NEW ${mm(ta)}  |  OLD ${mm(tb)}")
    }

    if (exps("q129tail")) {
      val assigned = queries.SimilarityQueries
        .ivf2Assigned(spark, sfDir).localCheckpoint()
      ab("q129tail") {
        queries.SimilarityQueries.neardupPairsExact(assigned).count(); ()
      } {
        queries.SimilarityQueries.neardupPairsExactRef(assigned).count(); ()
      }
    }
    if (exps("q91") || exps("q138") || exps("q150")) {
      val t = queries.ChainQueries.fixtureTables(spark)
      queries.ChainQueries.warmFlows(spark)
      val shared = queries.ChainQueries.sharedFlows(spark)
      if (exps("q91")) ab("q91") {
        graft.chain.GraphEdges.pageRank(t, iters = 3, dust = 1000000L,
          precomputedFlows = Some(shared)).count(); ()
      } {
        // the r18 form: flows WITH the presentation sort, derived in-query
        graft.chain.GraphEdges.pageRank(t, iters = 3, dust = 1000000L,
          precomputedFlows = Some(
            graft.chain.GraphEdges.flows(t, dust = 1000000L))).count(); ()
      }
      if (exps("q138")) ab("q138") {
        graft.chain.GraphEdges.taintFlow(t, hops = 3, dust = 1000000L,
          precomputedFlows = Some(shared)).count(); ()
      } {
        graft.chain.GraphEdges.taintFlow(t, hops = 3, dust = 1000000L,
          precomputedFlows = Some(
            graft.chain.GraphEdges.flows(t, dust = 1000000L))).count(); ()
      }
      def triangles(und0: org.apache.spark.sql.DataFrame): Long = {
        import graft.Lineage.LineageCut
        val und = und0.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct().cutLineage()
        val deg = und.select(col("a").as("v"))
          .unionByName(und.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val oriented = und
          .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
          .select(when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
              struct(col("a").as("u"), col("b").as("w")))
            .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
          .select(col("e.u").as("u"), col("e.w").as("w"))
          .cutLineage()
        val wedges = oriented.as("x")
          .join(oriented.as("y"),
            col("x.u") === col("y.u") && col("x.w") < col("y.w"))
          .select(col("x.w").as("a"), col("y.w").as("b"), col("x.u").as("apex"))
        wedges.join(und, Seq("a", "b"))
          .select(explode(array(col("apex"), col("a"), col("b"))).as("script"))
          .groupBy("script").agg(count(lit(1)).as("nTriangles"))
          .orderBy(col("nTriangles").desc, col("script")).limit(10).count()
      }
      if (exps("q150")) ab("q150") {
        triangles(shared); ()
      } {
        triangles(graft.chain.GraphEdges.flows(t, dust = 1000000L)); ()
      }
    }
    // (the q80 collect_list candidate was measured here and rejected —
    // numbers at the q80 site; the experiment arm is gone with it)
    // native-kernel swaps (word_bigrams, line_structs): NEW = the query
    // path's compiled kernel, OLD = the retained declarative form wired
    // into the identical downstream, in the same JVM.
    if (exps("kernels")) {
      import graft.functions.TextFunctions.{bigrams, bigramsHof, toks, hash64}
      val docs = Tables.load(spark, sfDir, "documents")
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      // pass level: the kernel alone over the corpus
      ab("bigramPass") {
        noop(docs.select(col("doc_id"), toks(col("text")).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), explode(bigrams(col("tk"))).as("bg")))
      } {
        noop(docs.select(col("doc_id"), toks(col("text")).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"), explode(bigramsHof(col("tk"))).as("bg")))
      }
      def oldDocLines(d: org.apache.spark.sql.DataFrame) = {
        val extras = d.columns.filter(c => c != "doc_id" && c != "text").map(col)
        d.select(col("doc_id") +:
            queries.TextQueries.lineArrays(col("text")).as("lns") +: extras: _*)
          .select(col("doc_id") +:
            posexplode(col("lns")).as(Seq("idx", "lt")) +: extras: _*)
          .select(col("doc_id") +: col("idx") +:
            hash64(concat_ws(" ", col("lt")), queries.TextQueries.LineSeed).as("h") +:
            size(col("lt")).cast("long").as("ntk") +:
            when(col("idx") < 1000000,
              col("doc_id") * 1000000L + col("idx"))
              .otherwise(raise_error(lit("overflow"))).as("rk") +: extras: _*)
      }
      ab("docLinesPass") {
        noop(queries.TextQueries.docLines(docs.select("doc_id", "text", "source")))
      } {
        noop(oldDocLines(docs.select("doc_id", "text", "source")))
      }
      // full query: q158 (old form reconstructed on oldDocLines), q79
      // (old form with the inline HOF bigrams)
      ab("q158") {
        SparkEntry.queries("q158_line_filter")(spark, sfDir).count(); ()
      } {
        oldDocLines(docs.select("doc_id", "text", "source"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_lines"),
            sum((col("ntk") < 5).cast("long")).as("n_short"),
            sum(when(col("ntk") < 5, col("ntk")).otherwise(0L)).as("short_tokens"),
            sum(when(col("ntk") >= 5, col("ntk")).otherwise(0L)).as("kept_tokens"))
          .withColumn("short_frac",
            round(col("n_short").cast("double") / col("n_lines"), 6))
          .orderBy("source").count(); ()
      }
      ab("q111") {
        SparkEntry.queries("q111_bpe_merge_pairs")(spark, sfDir).count(); ()
      } {
        val w = docs.select(explode(toks(col("text"))).as("w"))
          .filter(length(col("w")) >= 2)
        w.select(explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(25).count(); ()
      }
      ab("q79") {
        SparkEntry.queries("q79_bigram_lm_score")(spark, sfDir).count(); ()
      } {
        val tk = toks(col("text"))
        val base = docs.select(col("doc_id"), tk.as("tk"))
          .filter(size(col("tk")) >= 2)
        val bgs = base.select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat(element_at(col("tk"), i), lit(" "),
              element_at(col("tk"), i + lit(1))))).as("bg"))
        val corpusBg = bgs.groupBy("bg").agg(count(lit(1)).as("cb"))
        val cw = base.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val v = cw.agg(count(lit(1)).as("v"))
        val bgLp = corpusBg
          .withColumn("w1", split(col("bg"), " ").getItem(0))
          .join(cw, col("w1") === col("w"))
          .crossJoin(broadcast(v))
          .select(col("bg"),
            floor(log2((col("cb") + lit(1.0)) /
              (col("cw") + col("v").cast("double"))) * 1e9)
              .cast("long").as("lpq"))
        bgs.join(bgLp.hint("shuffle_hash"), "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("lpq").as("tqs"))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("tqs").cast("double") / 1e9 /
              col("n_bigrams").cast("double"), 4).as("avg_logp"))
          .orderBy("doc_id").count(); ()
      }
    }
    // stage attribution probes (guide §1.4 noop sink so nothing prunes):
    // where do q79/q158 actually spend — tokenize, the interpreted HOF
    // kernel (bigram transform / lineArrays), or the downstream exchanges?
    if (exps("prof")) {
      import graft.functions.TextFunctions.toks
      val docs = Tables.load(spark, sfDir, "documents")
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def timed(label: String)(f: => Unit): Unit = {
        f // warm
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"[prof] $label%-22s min ${ts.min}%6.2f med ${ts.sorted.apply(reps / 2)}%6.2f")
      }
      timed("scan") { noop(docs.select(col("doc_id"), col("text"))) }
      timed("tokenize") { noop(docs.select(col("doc_id"), toks(col("text")).as("tk"))) }
      timed("bigram hof") {
        noop(docs.select(col("doc_id"), toks(col("text")).as("tk"))
          .filter(size(col("tk")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat(element_at(col("tk"), i), lit(" "),
                element_at(col("tk"), i + lit(1))))).as("bg")))
      }
      timed("lineArrays") {
        noop(docs.select(col("doc_id"),
          queries.TextQueries.lineArrays(col("text")).as("lns")))
      }
      timed("docLines") { noop(queries.TextQueries.docLines(
        docs.select("doc_id", "text", "source"))) }
      timed("q79 full") { SparkEntry.queries("q79_bigram_lm_score")(spark, sfDir).count(); () }
      timed("q158 full") { SparkEntry.queries("q158_line_filter")(spark, sfDir).count(); () }
      timed("q160 full") { SparkEntry.queries("q160_pmi_collocations")(spark, sfDir).count(); () }
      timed("q152 full") { SparkEntry.queries("q152_line_provenance")(spark, sfDir).count(); () }
    }
    spark.stop()
  }
}
