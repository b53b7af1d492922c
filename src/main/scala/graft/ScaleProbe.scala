package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical 10× scale spot-check for the dedup/graph/ANN families
  * (PLANS.md records the results): materializes a 10×-documents /
  * 10×-embeddings corpus under /tmp and times each family at 1× vs
  * 10×, printing per-query seconds and the pair-count growth factor.
  *
  * Corpus construction preserves the DUPLICATE-FAMILY DISTRIBUTION:
  * copy i of the documents table rewrites every token t → "t_i", a
  * bijection on shingles, so within-copy Jaccard structure is
  * identical to the original while cross-copy shingle sets are
  * disjoint — true near-dup pairs (and the df-capped shingle
  * universe) grow exactly linearly, which is what a 10×-bigger crawl
  * with the same duplication rate looks like. Naive 10× duplication
  * (no salt) would instead create 10-wide cross-copy families and
  * quadratically inflate pairs — a different corpus, not a bigger one.
  *
  * `runMain graft.ScaleProbe [queries...]` — SPARK_GRAFT_SF_DIR is the
  * 1× base (default sf0.1); SPARK_GRAFT_SCALE_COPIES overrides the
  * copy factor (default 10 — the per-round SCALE_BENCH.json record; a
  * non-default factor writes its own SCALE_BENCH_<N>X.json so deeper
  * probes of watch-listed queries, e.g. the r16 verdict's 30×
  * cf_slope_one ask, gate mechanically too). */
object ScaleProbe {
  private val Copies = {
    val raw = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10")
    raw.toIntOption.filter(_ >= 2).getOrElse(
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_SCALE_COPIES must be an integer >= 2, got '$raw'"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir10 = s"${sys.props("java.io.tmpdir")}/graft_scale${Copies}x"

    // ---- materialize the 10× corpus (idempotent per JVM tmpdir) ----
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = docs.count()
    val docs10 = (0 until Copies).map { i =>
      docs.select(
        ($"doc_id" + lit(i.toLong * nDocs)).as("doc_id"),
        array_join(transform(split($"text", " "), t => concat(t, lit(s"_$i"))), " ").as("text"),
        $"lang", $"source", $"n_chars")
    }.reduce(_ unionByName _)
    docs10.repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir10/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val nEmb = emb.count()
    val emb10 = (0 until Copies).map { i =>
      emb.select(($"vec_id" + lit(i.toLong * nEmb)).as("vec_id"), $"label", $"embedding")
    }.reduce(_ unionByName _)
    emb10.repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir10/embeddings.parquet")
    // 10× orders/lineitem for the exact-global-rank window family
    // (q85/q95/q99/q110): copy i shifts every key by i·(max+1), so the
    // per-customer aggregate cardinality ALSO grows 10× — the rank
    // input scales, not just the fact rows under it.
    val ord = spark.read.parquet(s"$base/orders.parquet")
    val custStep = ord.agg(max($"o_custkey")).head.getLong(0) + 1
    val okeyStep = ord.agg(max($"o_orderkey")).head.getLong(0) + 1
    val ord10 = (0 until Copies).map { i =>
      ord.select(($"o_orderkey" + lit(i * okeyStep)).as("o_orderkey"),
        ($"o_custkey" + lit(i * custStep)).as("o_custkey"),
        $"o_orderstatus", $"o_totalprice", $"o_orderdate", $"o_orderpriority")
    }.reduce(_ unionByName _)
    ord10.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$dir10/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val li10 = (0 until Copies).map { i =>
      li.withColumn("l_orderkey", $"l_orderkey" + lit(i * okeyStep))
    }.reduce(_ unionByName _)
    li10.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$dir10/lineitem.parquet")
    // 10× events for the time-series window family (q123/q125/q126/
    // q127): copy i shifts the raw nanos timestamps by i·(span + 1 h),
    // so every per-type SERIES gets 10× longer — the window/prefix
    // inputs scale in sequence length, the dimension that melts a
    // quadratic frame. (ts is the raw nanos long via nanosAsLong;
    // Tables.events reconstructs micros the same way on the copy.)
    // dims ride along 1× (supplier/nation for the HHI join family —
    // the scaling input is the fact side); part is copied with SHIFTED
    // PRICES so q86_skyline's distinct-price domain — its true scale
    // axis — grows 10× too.
    for (t <- Seq("supplier", "nation", "region"))
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir10/$t.parquet")
    // 10× customer with the SAME custkey step as orders, so the
    // fact-dim join family (q137/q139/q140) keeps referential
    // integrity and its per-customer cardinalities at 10×
    val cu = spark.read.parquet(s"$base/customer.parquet")
    val cu10 = (0 until Copies).map { i =>
      cu.withColumn("c_custkey", $"c_custkey" + lit(i * custStep))
    }.reduce(_ unionByName _)
    cu10.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$dir10/customer.parquet")
    val pt = spark.read.parquet(s"$base/part.parquet")
    val pkeyStep = pt.agg(max($"p_partkey")).head.getLong(0) + 1
    val priceStep = math.ceil(
      pt.agg(max($"p_retailprice")).head.getDouble(0)) + 1.0
    val pt10 = (0 until Copies).map { i =>
      pt.withColumn("p_partkey", $"p_partkey" + lit(i * pkeyStep))
        .withColumn("p_retailprice", $"p_retailprice" + lit(i * priceStep))
    }.reduce(_ unionByName _)
    pt10.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$dir10/part.parquet")
    // normalize ts to a NANOS long regardless of the generation's
    // encoding (nanos-as-long vs TIMESTAMP(MICROS)) — the copies are
    // written back as LongType nanos, which Tables.events handles
    val evRaw0 = spark.read.parquet(s"$base/events.parquet")
    val evRaw = evRaw0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => evRaw0
      case _ => evRaw0.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
    val (tsLo, tsHi) = {
      val r = evRaw.agg(min($"ts"), max($"ts")).head
      (r.getLong(0), r.getLong(1))
    }
    val evStep = tsHi - tsLo + 3600L * 1000000000L
    val nEv = evRaw.count()
    val ev10 = (0 until Copies).map { i =>
      evRaw.withColumn("ts", $"ts" + lit(i * evStep))
        .withColumn("event_id", $"event_id" + lit(i * (nEv + 1)))
    }.reduce(_ unionByName _)
    ev10.repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$dir10/events.parquet")
    println(s"corpus: ${nDocs}x$Copies docs, ${nEmb}x$Copies vectors at $dir10")

    // ---- time each family at 1× and 10× ----
    // Default probe set (no args): the 20 most expensive queries of
    // the committed quiet bench record — the r15 verdict ask: the 10×
    // evidence used to live as PLANS.md prose; now every round emits
    // SCALE_BENCH.json so a scale regression gates mechanically like
    // CORRECTNESS. An arg-filtered run probes those queries but does
    // NOT overwrite the round record.
    val fromQuiet: Seq[String] =
      try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get("BENCH_QUIET.json")))
        import scala.jdk.CollectionConverters._
        node.get("queries").properties().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toSeq
          .sortBy(-_._2).map(_._1)
          .filter(SparkEntry.queries.contains)
          // stream_* rates/soaks are STREAM_BENCH's job (r18: they CAN
          // be probed here by name — tableStream dispatches on the 10×
          // directory layout — but the default record stays batch-only)
          .filterNot(_.startsWith("stream_"))
          .take(20)
      } catch { case _: Throwable => Seq.empty }
    val qs = if (args.nonEmpty) args.toSeq
      else if (fromQuiet.nonEmpty) fromQuiet
      else Seq(
        "dedup_exact", "dedup_ngram_jaccard", "dedup_cluster_reps",
        "dedup_graph_pagerank", "dedup_minhash_lsh", "dedup_simhash",
        "sim_knn_brute", "sim_knn_lsh", "sim_knn_ivf", "sim_knn_pq",
        "q85_equidepth_bins", "q95_rfm_segments",
        "q99_gini_concentration", "q110_decile_lift", "samp_shuffle")
    case class Probe(q: String, t1: Double, n1: Long, t10: Double, n10: Long) {
      def ratio: Double = if (t1 > 0) t10 / t1 else -1.0
      // ≤ ~linear: N× data may pay up to ~1.2N× (shuffle log factors;
      // 1.5N is the gate) on fixed cores; sub-second 1× times are
      // fixed-overhead-dominated, so the gate floors the denominator
      // at 0.3 s before judging. At the default 10 copies this is the
      // same 15× bound every prior round's record used.
      def verdict: String =
        if (t1 < 0 || t10 < 0) "failed"
        else if (t10 <= 1.5 * Copies * math.max(t1, 0.3)) "linear_ok"
        else "superlinear"
    }
    // min of two runs per (query, scale): same one-time-cost
    // attribution discipline as Bench
    def time(q: String, d: String): (Double, Long) = {
      def once(): Option[(Double, Long)] =
        try {
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, d).count()
          Some(((System.nanoTime() - t0) / 1e9, n))
        } catch { case e: Throwable =>
          System.err.println(s"[scale] $q failed: ${e.getMessage}"); None
        }
      val runs = Seq(once(), once()).flatten
      if (runs.isEmpty) (-1.0, -1L) else (runs.map(_._1).min, runs.head._2)
    }
    val probes = qs.map { q =>
      val (t1, n1) = time(q, base)
      val (t10, n10) = time(q, dir10)
      val p = Probe(q, t1, n1, t10, n10)
      println(f"$q%-26s 1x ${p.t1}%7.2f s (rows=$n1)  ${Copies}x ${p.t10}%7.2f s " +
        f"(rows=$n10)  ratio ${p.ratio}%5.2f  ${p.verdict}")
      p
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val json = probes.map { p =>
      "\"" + p.q + s"""":{"t1x":${fmt(p.t1)},"t${Copies}x":${fmt(p.t10)},""" +
        s""""rows1x":${p.n1},"rows${Copies}x":${p.n10},""" +
        s""""ratio":${fmt(p.ratio)},"verdict":"${p.verdict}"}"""
    }.mkString(
      s"""{"metric":"scale_${Copies}x","sf":"$base","copies":$Copies,"queries":{""",
      ",", "}}")
    // A probe of an explicit query subset MERGES into the existing
    // record instead of replacing it (r17 ADVICE: a partial probe
    // used to overwrite SCALE_BENCH_<N>X.json indistinguishably from
    // a full-suite run) — per-query entries are keyed, so folding the
    // new measurements over the old file keeps every previously
    // probed query's evidence while refreshing the ones just run.
    val outPath = java.nio.file.Paths.get(
      if (Copies == 10) "SCALE_BENCH.json" else s"SCALE_BENCH_${Copies}X.json")
    val out =
      if (args.isEmpty || !java.nio.file.Files.exists(outPath)) json
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val prev = om.readTree(java.nio.file.Files.readAllBytes(outPath))
        // SF GUARD (r18 ADVICE, mirroring the bench quiet-baseline's):
        // a partial probe run at a different SPARK_GRAFT_SF_DIR must
        // not fold per-query entries under the old file's "sf" label —
        // replace the record wholesale instead of mixing scales.
        val prevSf = Option(prev.get("sf")).map(_.asText()).getOrElse("")
        if (prevSf != base) {
          System.err.println(s"[scaleprobe] existing $outPath has sf " +
            s"'$prevSf' != current '$base' — replacing wholesale, not merging")
          json
        } else {
          val merged = om.readTree(json)
          val prevQs = prev.get("queries").asInstanceOf[
            com.fasterxml.jackson.databind.node.ObjectNode]
          prevQs.setAll(merged.get("queries").asInstanceOf[
            com.fasterxml.jackson.databind.node.ObjectNode])
          prev.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .set("queries", prevQs)
          om.writeValueAsString(prev)
        }
      }
    // SCALE_BENCH.json (the 10× per-round record) stays full-suite-
    // only; the deep-probe files accept keyed merges so watch-list
    // queries can be added one at a time without losing prior entries.
    if (args.isEmpty || Copies != 10)
      java.nio.file.Files.writeString(outPath, out + "\n")
    println(json)
    spark.stop()
  }
}
