package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions._

/** Deduplication family (north-star LLM-data operators): exact,
  * normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: every variant is candidate-generation → verify.
  * Candidates come from an equi-join on a derived key (fingerprint,
  * shared shingle, LSH band, SimHash band) so the shuffle is keyed and
  * partial — never an O(n²) cross join. At 100 TB the band/shingle
  * explode is the only data amplification and it's bounded per doc.
  */
object DedupQueries {
  type Q = (SparkSession, String) => DataFrame

  /** doc_id + distinct 3-token shingles. The corpus arrives as one
    * parquet row group (single scan task); shingling is CPU-dense, so
    * spread it across the cores before computing — at 100 TB the same
    * principle holds: size partitions for the compute stage, not the
    * scan. */
  private[operators] def docShingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id", shingles3(tokens($"text")).as("sh"))
  }

  /** (doc_id, h) rows of the df-capped shingle universe (cap = 10) —
    * the shared candidate-generation substrate of the jaccard and
    * containment joins. No broadcast hints here: `keep` is corpus-
    * cardinality (one row per surviving shingle hash), so a forced
    * broadcast is a driver OOM at 100 TB; the join is keyed and AQE
    * broadcasts it when the build side turns out small at runtime,
    * with Spark's runtime bloom-filter injection covering the
    * semi-join-reduction role at scale. The result feeds multiple
    * consumers (sizes + both sides of a self-join), so it rides an
    * eager localCheckpoint — materialized ONCE with truncated lineage,
    * where cache() left several full shingle-pipeline plans competing
    * for block-manager space across a long multi-query session. The
    * trade-off: localCheckpoint's blocks are unreplicated executor
    * state, so on a real cluster an executor loss FAILS the query
    * (cache degrades gracefully by recomputing its lineage); the
    * cluster-scale variants are reliable checkpoint() to HDFS/S3 or a
    * replicated StorageLevel, at a write-cost premium. For a dedup
    * pass — cheap to rerun, hot for minutes not days — fail-and-rerun
    * is the standard production trade. */
  /** One substrate per (session, corpus), not per query: four
    * consumers (jaccard, containment, clustering, and their sizes)
    * previously each re-shingled + re-checkpointed the corpus, so
    * per-query bench cost depended on which consumer ran first
    * (r9→r10 detail showed dedup_containment 1.74→4.87 s with no
    * source change — pure attribution drift). Memoized, the substrate
    * is paid exactly once per session+dir — in Bench, by the named
    * warm-up (`warmSubstrate`); in production, by whichever dedup pass
    * runs first, which is the correct 100 TB shape anyway (a dedup
    * pipeline computes its shingle index once, then runs all variants
    * against it). */
  private val substrateMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def cappedShingleRows(s: SparkSession, d: String): DataFrame =
    substrateMemo.computeIfAbsent((s, d), { _ =>
      import s.implicits._
      val cap = 10
      val ex = docShingles(s, d)
        .select($"doc_id", explode($"sh").as("shingle"))
        .select($"doc_id", xxhash64($"shingle").as("h"))
      val keep = ex.groupBy($"h").agg(count(lit(1)).as("df"))
        .filter($"df" <= cap).select($"h")
      ex.join(keep, Seq("h")).localCheckpoint()
    })

  /** Bench hook: materialize the shared shingle substrate up front so
    * the per-query timings measure each query's own plan, not
    * whichever query happens to touch the substrate first. */
  def warmSubstrate(s: SparkSession, d: String): Unit =
    cappedShingleRows(s, d).count(): Unit

  /** Near-dup pairs (jaccard ≥ 0.5) over the df-capped shingle universe
    * — shared by dedup_ngram_jaccard and the clustering on top of it.
    * See the dedup_ngram_jaccard scaladoc below for the scale analysis. */
  private[operators] def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val exr = cappedShingleRows(s, d)
    val sizes = exr.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = exr.as("a").join(exr.as("b"),
      $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select($"doc_id".as("d1"), $"n".as("n1")), Seq("d1"))
      .join(sizes.select($"doc_id".as("d2"), $"n".as("n2")), Seq("d2"))
      .select($"d1", $"d2",
        ($"inter" * lit(1.0) / ($"n1" + $"n2" - $"inter")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
  }

  val queries: Map[String, Q] = Map(
    // Exact dedup: hash-groupBy on the raw text; representative = min id.
    // (One shuffle keyed by the md5 — at scale, group on the hash, not
    // the full text, so the shuffle rows stay small.)
    "dedup_exact" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .groupBy(md5($"text").as("fp"))
        .agg(min($"doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"fp")
    }),

    // Exact dedup on the normalized form (case/whitespace robust).
    "dedup_exact_norm" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .groupBy(md5(normalize($"text")).as("fp"))
        .agg(min($"doc_id").as("rep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"fp")
    }),

    // n-gram Jaccard near-dup as a set-similarity join over a
    // BOILERPLATE-FILTERED shingle universe: shingles appearing in more
    // than `cap` docs are dropped from both intersection and union —
    // they multiply candidate pairs quadratically (measured 90×
    // candidate growth sf0.01→sf0.1 uncapped; that join is what melts
    // at 100 TB) while evidencing nothing about duplication. Singleton
    // (df=1) shingles stay in the union, so unique content still
    // dilutes the score. Within the capped universe the join-count IS
    // |A∩B| (shingles are distinct per doc), so no arrays ever ride a
    // shuffle; |A|,|B| come from a doc-keyed size table and the df
    // filter is a hash-keyed equi-join — both unhinted, so AQE
    // broadcasts them only when actually small. Cap mirrored in SQL →
    // full DuckDB oracle.
    "dedup_ngram_jaccard" -> ((s, d) =>
      jaccardPairs(s, d).orderBy(col("d1"), col("d2"))),

    // Near-dup CLUSTERING: the pair list alone doesn't dedupe — A~B and
    // B~C must collapse to one representative even when A≁C. Connected
    // components over the similarity graph via min-label propagation
    // WITH POINTER DOUBLING: each round every node takes the minimum
    // label among itself and its neighbors, then additionally follows
    // its label's own label (lab ← lab(lab)), so the propagation
    // distance doubles per round and convergence is O(log diameter)
    // rather than O(diameter) — 16 rounds cover components of diameter
    // 65k+. If the loop still hasn't reached fixpoint it THROWS instead
    // of returning silently-wrong labels (a chain-shaped boilerplate
    // family at 100 TB must fail loudly, not mis-cluster).
    //
    // Iteration state rides `localCheckpoint(eager)`, not `cache()`: a
    // checkpoint truncates the lineage so every round's plan is two
    // joins over materialized blocks, where cache() left the full
    // multi-round DAG in the plan — Catalyst re-analyzed and the cache
    // manager re-matched a growing tree each round (measured 4–6 s per
    // round at sf0.1; ~0.3 s checkpointed). Same executor-memory
    // footprint as a cache; on executor loss the query fails and
    // retries rather than silently recomputing — correct for derived
    // iterative state. Oracle: DuckDB recursive CTE, same closure.
    // (A declarative WITH RECURSIVE twin needs UNION-distinct recursion
    // — the reach closure diverges under UNION ALL on cycles — which
    // Spark 4.1 rejects (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the
    // driver-coordinated loop is the only Spark-side shape today.)
    "dedup_cluster_reps" -> ((s, d) => {
      import s.implicits._
      // The CORPUS-SCALE stage — the shingle join inside jaccardPairs —
      // runs at the session's shuffle-partition setting; the CC loop
      // itself is the shared ConnectedComponents.labels helper (also
      // the engine of sim_cluster_reps).
      val labels = ConnectedComponents.labels(s,
        jaccardPairs(s, d).select($"d1", $"d2"), "dedup_cluster_reps")
      documents(s, d).select($"doc_id")
        .join(labels.select($"id".as("doc_id"), $"lab"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"lab", $"doc_id").as("rep"))
        .groupBy($"rep".as("rep_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy($"rep_id")
    }),

    // Degree histogram of the similarity graph — the shape diagnostic
    // that tells you whether near-dup families are pairs (degree 1),
    // stars (one hub), or chains BEFORE running the clustering: a
    // heavy tail here predicts the propagation round count. Two keyed
    // aggregations over the pair list; the corpus never re-enters.
    "dedup_graph_degrees" -> ((s, d) => {
      import s.implicits._
      jaccardPairs(s, d)
        .select(explode(array($"d1", $"d2")).as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
        .groupBy($"degree").agg(count(lit(1)).as("n_docs"))
        .orderBy($"degree")
    }),

    // Triangle census of the similarity graph — the standard graph-
    // analytics primitive behind clustering coefficients and community
    // tightness. Edges are oriented by doc_id (d1 < d2 from the pair
    // stage), so each triangle is counted exactly once by the
    // wedge-close join: e1(a,b) ⋈ e2(b,c) semi-joined against e3(a,c).
    // All joins are keyed; at 100 TB the orientation key switches from
    // id to degree (degree-ordering bounds the wedge fan-out of hub
    // nodes — same plan, different orientation column). Wedge counts
    // come from the degree table, never by materializing wedges.
    "dedup_graph_triangles" -> ((s, d) => {
      import s.implicits._
      val e = jaccardPairs(s, d).select($"d1", $"d2").localCheckpoint()
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.d2") === col("e2.d1"))
        .join(e.as("e3"),
          col("e1.d1") === col("e3.d1") && col("e2.d2") === col("e3.d2"),
          "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      val wedges = e.select(explode(array($"d1", $"d2")).as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("dg"))
        .agg(sum(expr("dg * (dg - 1) DIV 2")).as("n_wedges"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      edges.crossJoin(wedges).crossJoin(tri) // all single-row sides
        .select($"n_edges", $"n_wedges", $"n_triangles")
    }),

    // LOCAL CLUSTERING COEFFICIENT profile — how tightly does each
    // node's neighborhood close into triangles, summarized per degree:
    // the community-tightness read that separates "chain" duplicate
    // families (low cc — transformed copies of copies) from "clique"
    // families (high cc — one source, many copies). Per-node triangle
    // counts come from the SAME oriented wedge-close join as the
    // census (inner instead of semi, corners exploded); cc is exact
    // basis points 2T/(deg(deg−1)); output is the degree-bucketed
    // summary, never a corpus-sized dump.
    "graph_clustering_coeff" -> ((s, d) => {
      import s.implicits._
      val e = jaccardPairs(s, d).select($"d1", $"d2").localCheckpoint()
      val corners = e.as("e1")
        .join(e.as("e2"), col("e1.d2") === col("e2.d1"))
        .join(e.as("e3"),
          col("e1.d1") === col("e3.d1") && col("e2.d2") === col("e3.d2"))
        .select(explode(array(col("e1.d1"), col("e1.d2"), col("e2.d2"))).as("doc_id"))
      val triPerNode = corners.groupBy($"doc_id").agg(count(lit(1)).as("tri"))
      val deg = e.select(explode(array($"d1", $"d2")).as("doc_id"))
        .groupBy($"doc_id").agg(count(lit(1)).as("dg"))
      deg.join(triPerNode, Seq("doc_id"), "left")
        .selectExpr("dg", "coalesce(tri, 0) AS tri",
          """CASE WHEN dg >= 2
            | THEN coalesce(tri, 0) * 10000 DIV (dg * (dg - 1) DIV 2)
            | ELSE NULL END AS cc_bp""".stripMargin)
        .groupBy($"dg")
        .agg(count(lit(1)).as("n_nodes"), sum($"tri").as("sum_tri"),
          sum($"cc_bp").as("sum_cc_bp"))
        .selectExpr("dg AS degree", "n_nodes", "sum_tri",
          "sum_cc_bp DIV n_nodes AS mean_cc_bp")
        .orderBy($"degree")
    }),

    // PageRank over the similarity graph — the centrality diagnostic
    // that surfaces the "hub" documents whose boilerplate stitches
    // near-dup families together. All arithmetic is INTEGER: ranks are
    // scaled to 1e12 units, per-neighbor contributions use DIV (floor),
    // and the damping step is (85·Σ) DIV 100 — deterministic on any
    // engine and any aggregation order, unlike double-precision
    // PageRank whose sums are order-dependent. Five fixed iterations,
    // each one keyed join + keyed agg over the (sparse) edge list; the
    // corpus never re-enters after the pair stage. State rides
    // localCheckpoint like the CC loop so per-round plans stay flat.
    // Symmetric edges mean no dangling nodes: every active vertex has
    // out-degree ≥ 1, so no mass-leak correction term is needed.
    "dedup_graph_pagerank" -> ((s, d) => {
      import s.implicits._
      val SCALE = 1000000000000L
      val edges = jaccardPairs(s, d)
        .select(explode(array(
          struct($"d1".as("src"), $"d2".as("dst")),
          struct($"d2".as("src"), $"d1".as("dst")))).as("e"))
        .select($"e.src".as("src"), $"e.dst".as("dst"))
        .localCheckpoint()
      // Rank/degree tables are vertex-sized (sparse graph ≪ corpus);
      // explicit small repartition on the checkpointed state instead of
      // mutating session-global shuffle partitions (concurrent queries
      // must never observe a temporary conf value). AQE coalesces the
      // per-round join shuffles to match.
      val loopParts = 4
      locally {
        val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
          .repartition(loopParts, $"src").localCheckpoint()
        var rank = deg.select($"src".as("doc_id"), lit(SCALE).as("r"))
          .localCheckpoint()
        for (_ <- 1 to 5) {
          val recv = edges
            .join(rank.select($"doc_id".as("src"), $"r"), Seq("src"))
            .join(deg, Seq("src"))
            .select($"dst", expr("r DIV deg").as("c"))
            .groupBy($"dst").agg(sum($"c").as("csum"))
          rank = deg.select($"src".as("doc_id"))
            .join(recv.select($"dst".as("doc_id"), $"csum"), Seq("doc_id"), "left")
            .select($"doc_id",
              (lit(15L * (SCALE / 100L)) + expr("85 * coalesce(csum, 0L) DIV 100")).as("r"))
            .repartition(loopParts, $"doc_id")
            .localCheckpoint()
        }
        deg.select($"src".as("doc_id"), $"deg")
          .join(rank, Seq("doc_id"))
          .select($"doc_id", $"deg", $"r".as("rank_scaled"))
          .orderBy($"rank_scaled".desc, $"doc_id")
          .limit(20)
      }
    }),

    // Corpus duplication dashboard: one row summarizing how much an
    // exact and a normalized-exact dedup pass would each remove —
    // the number every curation run reports first. Distinct counts are
    // two-phase (partial per-partition sets of 16-byte fingerprints);
    // percentages in floored basis points for exact cross-engine
    // arithmetic.
    "dedup_summary" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select(md5($"text".cast("binary")).as("fp"),
          md5(normalize($"text").cast("binary")).as("fpn"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"fp").as("n_uniq_exact"),
          countDistinct($"fpn").as("n_uniq_norm"))
        .select($"n_docs", $"n_uniq_exact", $"n_uniq_norm",
          floor(($"n_docs" - $"n_uniq_exact") * lit(10000.0) / $"n_docs").as("exact_dup_bp"),
          floor(($"n_docs" - $"n_uniq_norm") * lit(10000.0) / $"n_docs").as("norm_dup_bp"))
    }),

    // Keep-BEST exact dedup: per normalized fingerprint keep the most
    // content-rich copy (longest, doc_id tiebreak) instead of the
    // minimum id — the semantics curation pipelines actually want when
    // near-identical pages differ by boilerplate. One keyed shuffle
    // (window by fingerprint); the rank key (n_chars DESC, doc_id) is
    // a total order, so the winner is deterministic on both engines.
    "dedup_keep_best" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"fp").orderBy($"n_chars".desc, $"doc_id")
      documents(s, d)
        .select($"doc_id", $"n_chars", md5(normalize($"text").cast("binary")).as("fp"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"fp", $"doc_id".as("rep_id"), $"n_chars")
        .orderBy($"fp")
    }),

    // Repeated-span diagnostic (exact-substring dedup, à la
    // "Deduplicating Training Data Makes Language Models Better"): the
    // top most-frequent 8-token grams across the corpus, with how many
    // occurrences and how many distinct docs carry them — the spans an
    // exact-substring dedup pass would cut. ALL occurrences count (the
    // native NGrams kernel is position-ordered, not distinct), the
    // groupBy is partially aggregated map-side, and the final top-20 is
    // a TakeOrdered over the aggregate — the full gram stream never
    // sorts. (n_occ DESC, gram) is a total order → deterministic limit.
    "dedup_repeated_ngrams" -> ((s, d) => {
      import s.implicits._
      import graft.functions.GraftExpressions.ngrams
      documents(s, d)
        .select($"doc_id", explode(ngrams(tokens($"text"), 8)).as("gram"))
        .groupBy($"gram")
        .agg(count(lit(1)).as("n_occ"), countDistinct($"doc_id").as("n_docs"))
        .orderBy($"n_occ".desc, $"gram")
        .limit(20)
    }),

    // CONTAINMENT near-dup — the asymmetric complement of jaccard:
    // containment(A→B) = |A∩B|/|A| finds documents SUBSTANTIALLY
    // CONTAINED in another (quoted articles, boilerplate-wrapped
    // copies, chunk-of-document dupes) that a symmetric jaccard
    // threshold misses when the container is much larger. Same
    // df-capped shingle substrate and keyed joins as the jaccard pair
    // join; the self-join runs on doc_id ≠ (both directions — the
    // relation is asymmetric) and the verify denominator is the
    // CONTAINED side's shingle count only.
    "dedup_containment" -> ((s, d) => {
      import s.implicits._
      val exr = cappedShingleRows(s, d)
      val sizes = exr.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      exr.as("a").join(exr.as("b"),
          $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
        .groupBy($"a.doc_id".as("contained_id"), $"b.doc_id".as("container_id"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select($"doc_id".as("contained_id"), $"n".as("n_in")), Seq("contained_id"))
        .select($"contained_id", $"container_id",
          ($"inter" * lit(1.0) / $"n_in").as("containment"))
        .filter($"containment" >= 0.9)
        .orderBy($"contained_id", $"container_id")
    }),

    // INCREMENTAL dedup — the production ingest shape: a new batch
    // (doc_id ≡ 4 mod 5 stands in for today's crawl) is deduped
    // against the EXISTING corpus without rescanning it for pairs:
    // one anti-join keyed on the 16-byte normalized fingerprint (at
    // 100 TB the corpus side is a bucketed fingerprint index, so the
    // anti-join is zero-exchange on the index side and Spark's runtime
    // bloom filter prunes the batch before the shuffle), then a
    // within-batch keep-min window. Only batch-sized data ever sorts.
    "dedup_incremental" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"fp").orderBy($"doc_id")
      val all = documents(s, d)
        .select($"doc_id", md5(normalize($"text").cast("binary")).as("fp"))
      val corpus = all.filter($"doc_id" % 5 =!= 4)
      val batch = all.filter($"doc_id" % 5 === 4)
      batch.join(corpus.select($"fp"), Seq("fp"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"fp")
        .orderBy($"doc_id")
    }),

    // MinHash + LSH near-dup: 64-hash signature, 16 bands × 4 rows →
    // candidates from band-key equi-join, then exact-Jaccard verify.
    // Same verify threshold as dedup_ngram_jaccard, so at high recall
    // the outputs converge — the LSH path just avoids the shingle-join
    // amplification at scale. The signature hash is md5-derived
    // (PortableHash.md5hash60) with splitmix64 affine remixes, both
    // DuckDB-replayable, so the FULL pair list is hash-gated: the
    // oracle recomputes signatures/bands in HUGEINT mod-2^64
    // arithmetic and joins on band-slice equality (vs Spark's
    // xxhash64 band key — equal up to a ~2^-64 key-collision, which
    // the jaccard verify then filters identically). The paired
    // dedup_minhash_lsh_check additionally gates recall vs exact pairs.
    "dedup_minhash_lsh" -> ((s, d) => minhashPairs(s, d).orderBy(col("d1"), col("d2"))),

    // SimHash near-dup: 64-bit signature; candidates share one of four
    // 16-bit bands (pigeonhole: any pair within Hamming distance 3 must
    // agree on ≥1 band); verify = Hamming ≤ 3 via bit_count(XOR).
    // md5-derived per-token hash → the oracle rebuilds the signature
    // bit-by-bit (64 vote sums per doc) and replays banding + verify,
    // hash-gating the full pair list; dedup_simhash_check still pins
    // the pigeonhole-exactness invariant.
    "dedup_simhash" -> ((s, d) => simhashPairs(s, d).orderBy(col("d1"), col("d2"))),

    // INCREMENTAL NEAR-DUP — dedup_incremental's MinHash twin, the
    // daily-crawl production shape: the new batch (doc_id ≡ 4 mod 5)
    // is checked against the EXISTING corpus's LSH band index with one
    // keyed band equi-join — batch-sized band rows probe the persisted
    // index, no batch×batch or corpus×corpus work ever happens — then
    // exact-Jaccard verify against only the colliding corpus docs.
    // Output is the per-batch-doc admission verdict (near-dup of the
    // corpus → drop, plus match count and the first matching corpus
    // doc). At 100 TB the corpus band index is a bucketed table the
    // batch join reads without shuffling the corpus. Portable md5
    // signatures → the whole verdict table is hash-gated.
    "dedup_incremental_lsh" -> ((s, d) => {
      import s.implicits._
      val sh = docShingles(s, d).filter(size($"sh") > 0).localCheckpoint()
      val sig = sh.select($"doc_id", minhashSignature($"sh", 64).as("sig")).localCheckpoint()
      val bands = sig
        .select($"doc_id", posexplode(lshBands($"sig", 16, 4)).as(Seq("band", "key")))
      val cand = bands.filter($"doc_id" % 5 === 4).as("b")
        .join(bands.filter($"doc_id" % 5 =!= 4).as("c"),
          $"b.band" === $"c.band" && $"b.key" === $"c.key")
        .select($"b.doc_id".as("batch_id"), $"c.doc_id".as("corpus_id"))
        .distinct()
      val verified = cand
        .join(sh.select($"doc_id".as("batch_id"), $"sh".as("sh1")), Seq("batch_id"))
        .join(sh.select($"doc_id".as("corpus_id"), $"sh".as("sh2")), Seq("corpus_id"))
        .select($"batch_id", $"corpus_id",
          jaccard($"sh1", $"sh2").as("jaccard"))
        .filter($"jaccard" >= 0.5)
      sig.filter($"doc_id" % 5 === 4).select($"doc_id".as("batch_id"))
        .join(verified.groupBy($"batch_id")
            .agg(count(lit(1)).as("n_matches"), min($"corpus_id").as("first_match")),
          Seq("batch_id"), "left")
        .selectExpr("batch_id",
          "coalesce(n_matches, 0) AS n_matches",
          "first_match",
          "n_matches IS NOT NULL AS is_dup")
        .orderBy($"batch_id")
    }),

    // MinHash ESTIMATION ACCURACY: for every LSH candidate pair, the
    // signature-agreement Jaccard estimate (agree/64 in basis points)
    // against the exact shingle-set Jaccard — the calibration table
    // that tells a curation run how tight its verify threshold must be
    // before it can skip the exact-verify join (at 100 TB, skipping
    // verify means candidates never re-read shingle sets; this query
    // quantifies what that trade costs). All integer arithmetic; the
    // portable md5 signature makes the whole table hash-gated.
    "dedup_minhash_est" -> ((s, d) => {
      import s.implicits._
      val sh = docShingles(s, d).filter(size($"sh") > 0).localCheckpoint()
      val sig = sh.select($"doc_id", minhashSignature($"sh", 64).as("sig")).localCheckpoint()
      val bands = sig
        .select($"doc_id", posexplode(lshBands($"sig", 16, 4)).as(Seq("band", "key")))
      val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .distinct()
      cand
        .join(sig.select($"doc_id".as("d1"), $"sig".as("sig1")), Seq("d1"))
        .join(sig.select($"doc_id".as("d2"), $"sig".as("sig2")), Seq("d2"))
        .join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), Seq("d1"))
        .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), Seq("d2"))
        .select($"d1", $"d2",
          aggregate(zip_with($"sig1", $"sig2",
              (x, y) => when(x === y, 1L).otherwise(0L)),
            lit(0L), (acc, v) => acc + v).as("agree"),
          size(array_intersect($"sh1", $"sh2")).cast("long").as("inter"),
          size($"sh1").cast("long").as("n1"), size($"sh2").cast("long").as("n2"))
        .selectExpr("d1", "d2",
          "agree * 10000 DIV 64 AS est_bp",
          "inter * 10000 DIV (n1 + n2 - inter) AS exact_bp",
          "agree * 10000 DIV 64 - inter * 10000 DIV (n1 + n2 - inter) AS err_bp")
        .orderBy($"d1", $"d2")
    }),

    // LSH BAND TUNING: the (bands × rows-per-band) operating-point
    // sweep every LSH deployment runs before fixing its config — one
    // 64-value signature pass, three band layouts sliced from it
    // ((32,2) recall-biased, (16,4) shipped, (8,8) precision-biased),
    // and per config: candidate count, verified count (exact Jaccard
    // ≥ 0.5), precision, and coverage of the union of all configs'
    // verified sets. Candidates stay banded per config — the sweep
    // costs three keyed self-joins, never all-pairs, so the tuning
    // itself runs at corpus scale.
    "dedup_lsh_tuning" -> ((s, d) => {
      import s.implicits._
      val sh = docShingles(s, d).filter(size($"sh") > 0).localCheckpoint()
      val sig = sh.select($"doc_id", minhashSignature($"sh", 64).as("sig")).localCheckpoint()
      val cfgs = Seq((32, 2), (16, 4), (8, 8))
      val verifiedPerCfg = cfgs.map { case (b, r) =>
        val bands = sig.select($"doc_id",
          posexplode(lshBands($"sig", b, r)).as(Seq("band", "key")))
        val cand = bands.as("a").join(bands.as("b"),
          $"a.band" === $"b.band" && $"a.key" === $"b.key" && $"a.doc_id" < $"b.doc_id")
          .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
          .distinct()
        cand
          .join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), Seq("d1"))
          .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), Seq("d2"))
          .select(lit(b).as("cfg_bands"), lit(r).as("cfg_rows"), $"d1", $"d2",
            (jaccard($"sh1", $"sh2") >= 0.5).as("ok"))
      }.reduce(_ unionByName _).localCheckpoint()
      val union = verifiedPerCfg.filter($"ok").select($"d1", $"d2").distinct()
        .agg(count(lit(1)).as("n_union"))
      verifiedPerCfg
        .groupBy($"cfg_bands", $"cfg_rows")
        .agg(count(lit(1)).as("n_candidates"),
          sum(when($"ok", 1L).otherwise(0L)).as("n_verified"))
        .crossJoin(union) // 1-row side
        .selectExpr("cfg_bands", "cfg_rows", "n_candidates", "n_verified",
          "n_verified * 10000 DIV greatest(n_candidates, 1) AS precision_bp",
          "n_verified * 10000 DIV greatest(n_union, 1) AS coverage_bp")
        .orderBy($"cfg_bands")
    }),

    // Quality gate for the MinHash+LSH path: recall of the banded
    // candidate→verify pipeline against the exact jaccard-join pair set
    // (dedup_ngram_jaccard — SQL-recomputable). Measured recall is 1.0
    // at sf0.001/0.01/0.1 (near-dup families here are close to exact
    // copies, so 4-row band collision probability ≈ 1); the 0.9 floor
    // leaves margin while still failing loudly if the banding or verify
    // join breaks. n_exact_pairs rides along so the oracle also pins the
    // exact side.
    "dedup_minhash_lsh_check" -> ((s, d) => {
      import s.implicits._
      val exact = jaccardPairs(s, d).select($"d1", $"d2").localCheckpoint()
      val overlap = exact.join(minhashPairs(s, d).select($"d1", $"d2"), Seq("d1", "d2"))
        .agg(count(lit(1)).as("n_found"))
      exact.agg(count(lit(1)).as("n_exact_pairs")).crossJoin(overlap) // 1×1 rows
        .select($"n_exact_pairs",
          ($"n_found" * 10000L / greatest($"n_exact_pairs", lit(1L)) >= 9000).as("recall_ok"))
    }),

    // Exactness gate for the SimHash path: on the bounded doc_id<500
    // subset (complete at the gate SFs, a fixed-size sample beyond), the
    // banded candidate set must equal the brute-force all-pairs Hamming
    // ≤ 3 set EXACTLY — the pigeonhole guarantee (≤3 differing bits
    // cannot touch all 4 bands) makes banding lossless, so this is a
    // deterministic invariant, not a statistical one. The brute side is
    // ≤ 500² /2 signature pairs regardless of corpus size.
    "dedup_simhash_check" -> ((s, d) => {
      import s.implicits._
      val cap = 500
      val sig = documents(s, d).filter($"doc_id" < cap)
        .repartition(s.sparkContext.defaultParallelism)
        .select($"doc_id", simhash64(tokens($"text")).as("sim"))
        .localCheckpoint()
      val brute = sig.as("a").join(sig.as("b"), $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
          bit_count($"a.sim".bitwiseXOR($"b.sim")).as("hamming"))
        .filter($"hamming" <= 3)
        .select($"d1", $"d2")
      val banded = simhashPairs(s, d)
        .filter($"d1" < cap && $"d2" < cap).select($"d1", $"d2")
      val nBrute = brute.agg(count(lit(1)).as("n_brute"))
      val nBand = banded.agg(count(lit(1)).as("n_banded"))
      val nBoth = brute.join(banded, Seq("d1", "d2")).agg(count(lit(1)).as("n_both"))
      val nDocs = documents(s, d).filter($"doc_id" < cap)
        .agg(count(lit(1)).as("n_docs_checked"))
      nDocs.crossJoin(nBrute).crossJoin(nBand).crossJoin(nBoth) // all 1-row
        .select($"n_docs_checked",
          ($"n_brute" === $"n_both" && $"n_banded" === $"n_both").as("pigeonhole_exact_ok"))
    })
  )

  /** The dedup_minhash_lsh pipeline (see its scaladoc in `queries`). */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Eager localCheckpoint, not cache(): `sh` feeds three consumers
    // (the signature plus both verify-join sides) and `sig` anchors the
    // banding stage. A checkpoint materializes each exactly once and
    // truncates lineage; stacked cache() barriers in a long multi-query
    // session were vulnerable to block-manager eviction re-running the
    // whole shingle pipeline per consumer (the one bench outlier r7
    // recorded). Same executor-memory footprint, no eviction cliff.
    val sh = docShingles(s, d).filter(size($"sh") > 0).localCheckpoint()
    // Materialize the signature behind its own barrier: the banding
    // lambda references it 16×, and higher-order lambdas have no
    // common-subexpression elimination — inlined, the 64-hash
    // signature would be recomputed once PER BAND (measured 5× the
    // whole query's runtime at sf0.1).
    val sig = sh.select($"doc_id", minhashSignature($"sh", 64).as("sig")).localCheckpoint()
    // band rows carry only (doc_id, band, key) — signatures and
    // shingle arrays never enter the candidate shuffle
    val bands = sig
      .select($"doc_id", posexplode(lshBands($"sig", 16, 4)).as(Seq("band", "key")))
    val cand = bands.as("a").join(bands.as("b"),
      $"a.band" === $"b.band" && $"a.key" === $"b.key" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .distinct()
    // verify: exact Jaccard on the (few) surviving candidates only
    cand
      .join(sh.select($"doc_id".as("d1"), $"sh".as("sh1")), Seq("d1"))
      .join(sh.select($"doc_id".as("d2"), $"sh".as("sh2")), Seq("d2"))
      .select($"d1", $"d2", jaccard($"sh1", $"sh2").as("jaccard"))
      .filter($"jaccard" >= 0.5)
  }

  /** The dedup_simhash banded pipeline (see its scaladoc in `queries`). */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sig = documents(s, d)
      .select($"doc_id", simhash64(tokens($"text")).as("sim"))
      .localCheckpoint()
    val banded = sig.select($"doc_id", $"sim",
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", $"sim", b * 16).bitwiseAND(lit(0xFFFFL)).cast("long")))
        .as(Seq("band", "key")))
    banded.as("a").join(banded.as("b"),
      $"a.band" === $"b.band" && $"a.key" === $"b.key" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        bit_count($"a.sim".bitwiseXOR($"b.sim")).cast("long").as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
  }

  /** DuckDB twin of [[jaccardPairs]], shared by the pair and cluster
    * oracles (kept as a CTE block so both stay literally identical). */
  private[operators] val pairsCte =
    """sh AS (
      |  SELECT doc_id,
      |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
      |keep AS (
      |  SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle)
      |  WHERE df <= 10),
      |exr AS (SELECT doc_id, shingle FROM ex JOIN keep USING (shingle)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exr GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
      |  FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT d1, d2, jaccard FROM (
      |    SELECT d1, d2, i * 1.0 / (s1.n + s2.n - i) AS jaccard
      |    FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id)
      |  WHERE jaccard >= 0.5)""".stripMargin

  /** The 64 (i, A_i, B_i) MinHash mixers as a SQL VALUES list, straight
    * from the expression's own generator (unsigned rendering — the
    * oracle works in mod-2^64 HUGEINT space and converts to signed at
    * the end, matching JVM long wraparound). */
  private[operators] lazy val minhashMixerValues: String = {
    val (a, b) = graft.functions.MinHashSignature.mixers(64)
    (0 until 64).map { i =>
      s"($i, ${java.lang.Long.toUnsignedString(a(i))}, ${java.lang.Long.toUnsignedString(b(i))})"
    }.mkString(", ")
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_exact_norm" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        | MIN(doc_id) AS rep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $pairsCte
        |SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2""".stripMargin,

    "dedup_containment" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |keep AS (
        |  SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle)
        |  WHERE df <= 10),
        |exr AS (SELECT doc_id, shingle FROM ex JOIN keep USING (shingle)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exr GROUP BY doc_id),
        |cinter AS (
        |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id, COUNT(*) AS i
        |  FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT contained_id, container_id, containment FROM (
        |  SELECT contained_id, container_id, i * 1.0 / s1.n AS containment
        |  FROM cinter JOIN sizes s1 ON contained_id = s1.doc_id)
        |WHERE containment >= 0.9
        |ORDER BY contained_id, container_id""".stripMargin,

    "dedup_incremental" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |corpus AS (SELECT fp FROM f WHERE doc_id % 5 <> 4),
        |batch AS (SELECT doc_id, fp FROM f WHERE doc_id % 5 = 4),
        |nodup AS (
        |  SELECT b.doc_id, b.fp FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp))
        |SELECT doc_id, fp FROM (
        |  SELECT doc_id, fp,
        |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM nodup)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Connected components as a recursive closure: every label a node
    // can reach is enumerated, the minimum is its component id.
    "dedup_cluster_reps" ->
      s"""WITH RECURSIVE $pairsCte,
        |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
        |          UNION ALL SELECT d2, d1 FROM pairs),
        |reach(doc_id, lab) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst),
        |final AS (SELECT doc_id, MIN(lab) AS lab FROM reach GROUP BY doc_id)
        |SELECT lab AS rep_id, COUNT(*) AS n_members
        |FROM final GROUP BY lab ORDER BY rep_id""".stripMargin,
    // MinHash+LSH full pair list, replayed end-to-end: md5-derived
    // 60-bit shingle hash, the same 64 splitmix64 affine mixers as the
    // Scala expression (inlined below from MinHashSignature.mixers —
    // single source, no drift), signed mod-2^64 min per hash, band =
    // 4-value signature slice, candidates from band-slice equality,
    // exact-Jaccard ≥ 0.5 verify on the full shingle sets. HUGEINT
    // intermediates keep a·h ≤ 2^124 exact; the final signed CAST
    // mirrors JVM wraparound semantics bit-for-bit.
    "dedup_minhash_lsh" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
        |  FROM tok),
        |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shf),
        |hx AS (SELECT doc_id, ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h FROM ex),
        |ab(i, am, bm) AS (VALUES $minhashMixerValues),
        |g AS (
        |  SELECT doc_id, i,
        |    CAST(MIN(CASE WHEN gu >= 9223372036854775808 THEN gu - 18446744073709551616
        |             ELSE gu END) AS BIGINT) AS sig
        |  FROM (SELECT doc_id, i, (am::HUGEINT * h + bm) % 18446744073709551616 AS gu
        |        FROM hx CROSS JOIN ab)
        |  GROUP BY doc_id, i),
        |bsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS bkey
        |  FROM g GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bsig a JOIN bsig b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |j AS (
        |  SELECT d1, d2, len(list_intersect(s1.s, s2.s)) AS i,
        |    len(s1.s) AS n1, len(s2.s) AS n2
        |  FROM cand JOIN shf s1 ON d1 = s1.doc_id JOIN shf s2 ON d2 = s2.doc_id)
        |SELECT d1, d2, i * 1.0 / (n1 + n2 - i) AS jaccard
        |FROM j WHERE i * 1.0 / (n1 + n2 - i) >= 0.5
        |ORDER BY d1, d2""".stripMargin,

    // Incremental near-dup verdicts: the same signature/band replay,
    // candidates restricted to batch (doc_id%5=4) × corpus (rest).
    "dedup_incremental_lsh" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
        |  FROM tok),
        |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shf),
        |hx AS (SELECT doc_id, ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h FROM ex),
        |ab(i, am, bm) AS (VALUES $minhashMixerValues),
        |g AS (
        |  SELECT doc_id, i,
        |    CAST(MIN(CASE WHEN gu >= 9223372036854775808 THEN gu - 18446744073709551616
        |             ELSE gu END) AS BIGINT) AS sig
        |  FROM (SELECT doc_id, i, (am::HUGEINT * h + bm) % 18446744073709551616 AS gu
        |        FROM hx CROSS JOIN ab)
        |  GROUP BY doc_id, i),
        |bsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS bkey
        |  FROM g GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
        |  FROM bsig b JOIN bsig c
        |    ON b.band = c.band AND b.bkey = c.bkey
        |    AND b.doc_id % 5 = 4 AND c.doc_id % 5 <> 4),
        |ver AS (
        |  SELECT cd.batch_id, cd.corpus_id
        |  FROM cand cd
        |  JOIN shf s1 ON cd.batch_id = s1.doc_id
        |  JOIN shf s2 ON cd.corpus_id = s2.doc_id
        |  WHERE len(list_intersect(s1.s, s2.s)) * 1.0 /
        |    (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s))) >= 0.5),
        |agg AS (
        |  SELECT batch_id, CAST(count(*) AS BIGINT) AS n_matches,
        |    MIN(corpus_id) AS first_match
        |  FROM ver GROUP BY batch_id)
        |SELECT b.doc_id AS batch_id,
        |  coalesce(a.n_matches, 0) AS n_matches,
        |  a.first_match,
        |  a.n_matches IS NOT NULL AS is_dup
        |FROM (SELECT DISTINCT doc_id FROM shf WHERE doc_id % 5 = 4) b
        |LEFT JOIN agg a ON b.doc_id = a.batch_id
        |ORDER BY batch_id""".stripMargin,

    // Estimation-accuracy table: same signature/band replay as
    // dedup_minhash_lsh, agreement counted by joining the per-(doc,i)
    // signature table with itself over the candidate pairs.
    "dedup_minhash_est" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
        |  FROM tok),
        |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shf),
        |hx AS (SELECT doc_id, ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h FROM ex),
        |ab(i, am, bm) AS (VALUES $minhashMixerValues),
        |g AS (
        |  SELECT doc_id, i,
        |    CAST(MIN(CASE WHEN gu >= 9223372036854775808 THEN gu - 18446744073709551616
        |             ELSE gu END) AS BIGINT) AS sig
        |  FROM (SELECT doc_id, i, (am::HUGEINT * h + bm) % 18446744073709551616 AS gu
        |        FROM hx CROSS JOIN ab)
        |  GROUP BY doc_id, i),
        |bsig AS (
        |  SELECT doc_id, i // 4 AS band,
        |    string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS bkey
        |  FROM g GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM bsig a JOIN bsig b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |agr AS (
        |  SELECT c.d1, c.d2,
        |    CAST(SUM(CASE WHEN ga.sig = gb.sig THEN 1 ELSE 0 END) AS BIGINT) AS agree
        |  FROM cand c
        |  JOIN g ga ON ga.doc_id = c.d1
        |  JOIN g gb ON gb.doc_id = c.d2 AND gb.i = ga.i
        |  GROUP BY c.d1, c.d2),
        |ja AS (
        |  SELECT a.d1, a.d2, a.agree,
        |    CAST(len(list_intersect(s1.s, s2.s)) AS BIGINT) AS i,
        |    CAST(len(s1.s) AS BIGINT) AS n1, CAST(len(s2.s) AS BIGINT) AS n2
        |  FROM agr a JOIN shf s1 ON a.d1 = s1.doc_id JOIN shf s2 ON a.d2 = s2.doc_id)
        |SELECT d1, d2,
        |  CAST(agree * 10000 // 64 AS BIGINT) AS est_bp,
        |  CAST(i * 10000 // (n1 + n2 - i) AS BIGINT) AS exact_bp,
        |  CAST(agree * 10000 // 64 - i * 10000 // (n1 + n2 - i) AS BIGINT) AS err_bp
        |FROM ja ORDER BY d1, d2""".stripMargin,

    // Band-tuning sweep: the same g signature table sliced three ways
    // (i // rows_per_band); per-config candidates from band-slice
    // equality, verified by exact Jaccard, coverage vs the union.
    "dedup_lsh_tuning" ->
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(t)-1), i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
        |  FROM tok),
        |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |ex AS (SELECT doc_id, unnest(s) AS shingle FROM shf),
        |hx AS (SELECT doc_id, ('0x' || substring(md5(shingle), 1, 15))::BIGINT AS h FROM ex),
        |ab(i, am, bm) AS (VALUES $minhashMixerValues),
        |g AS (
        |  SELECT doc_id, i,
        |    CAST(MIN(CASE WHEN gu >= 9223372036854775808 THEN gu - 18446744073709551616
        |             ELSE gu END) AS BIGINT) AS sig
        |  FROM (SELECT doc_id, i, (am::HUGEINT * h + bm) % 18446744073709551616 AS gu
        |        FROM hx CROSS JOIN ab)
        |  GROUP BY doc_id, i),
        |cfg(cfg_bands, cfg_rows) AS (VALUES (32, 2), (16, 4), (8, 8)),
        |bsig AS (
        |  SELECT cfg_bands, cfg_rows, doc_id, i // cfg_rows AS band,
        |    string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i) AS bkey
        |  FROM g CROSS JOIN cfg GROUP BY cfg_bands, cfg_rows, doc_id, i // cfg_rows),
        |cand AS (
        |  SELECT DISTINCT a.cfg_bands, a.cfg_rows, a.doc_id AS d1, b.doc_id AS d2
        |  FROM bsig a JOIN bsig b
        |    ON a.cfg_bands = b.cfg_bands AND a.band = b.band AND a.bkey = b.bkey
        |    AND a.doc_id < b.doc_id),
        |ver AS (
        |  SELECT c.cfg_bands, c.cfg_rows, c.d1, c.d2,
        |    (len(list_intersect(s1.s, s2.s)) * 1.0 /
        |     (len(s1.s) + len(s2.s) - len(list_intersect(s1.s, s2.s)))) >= 0.5 AS ok
        |  FROM cand c JOIN shf s1 ON c.d1 = s1.doc_id JOIN shf s2 ON c.d2 = s2.doc_id),
        |un AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_union
        |  FROM (SELECT DISTINCT d1, d2 FROM ver WHERE ok)),
        |agg AS (
        |  SELECT cfg_bands, cfg_rows, CAST(count(*) AS BIGINT) AS n_candidates,
        |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
        |  FROM ver GROUP BY cfg_bands, cfg_rows)
        |SELECT cfg_bands, cfg_rows, n_candidates, n_verified,
        |  CAST(n_verified * 10000 // greatest(n_candidates, 1) AS BIGINT) AS precision_bp,
        |  CAST(n_verified * 10000 // greatest(n_union, 1) AS BIGINT) AS coverage_bp
        |FROM agg CROSS JOIN un ORDER BY cfg_bands""".stripMargin,

    // SimHash full pair list: rebuild each doc's 64-bit signature from
    // per-token md5 hashes (±1 vote per bit — 64 vote sums per doc),
    // then replay the 4×16-bit banding and the Hamming ≤ 3 verify.
    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |ht AS (SELECT doc_id, ('0x' || substring(md5(w), 1, 15))::BIGINT AS h FROM tok),
        |v AS (
        |  SELECT doc_id, bit,
        |    SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM ht CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) GROUP BY doc_id, bit),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS sim
        |  FROM v GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, sim, b AS band, (sim >> (b * 16)) & 65535 AS bkey
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b))
        |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |FROM banded a JOIN banded b
        |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY d1, d2""".stripMargin,

    // Integer PageRank unrolled to 5 chained CTEs (standard SQL forbids
    // aggregation inside a recursive term, so fixed iterations unroll).
    // Arithmetic mirrors the Spark side operator-for-operator: floor
    // division for contributions and damping, BIGINT casts after every
    // DuckDB SUM (HUGEINT otherwise).
    "dedup_graph_pagerank" -> {
      def iter(n: Int): String = {
        val prev = if (n == 1) "r0" else s"r${n - 1}"
        s"""r$n AS (
           |  SELECT d.src AS doc_id,
           |    CAST(150000000000 + 85 * COALESCE(c.csum, 0) // 100 AS BIGINT) AS r
           |  FROM deg d LEFT JOIN (
           |    SELECT e.dst, CAST(SUM(r.r // g.deg) AS BIGINT) AS csum
           |    FROM edges e JOIN $prev r ON e.src = r.doc_id JOIN deg g ON e.src = g.src
           |    GROUP BY e.dst) c ON d.src = c.dst)""".stripMargin
      }
      s"""WITH $pairsCte,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT src AS doc_id, CAST(1000000000000 AS BIGINT) AS r FROM deg),
         |${(1 to 5).map(iter).mkString(",\n")}
         |SELECT d.src AS doc_id, d.deg, r5.r AS rank_scaled
         |FROM deg d JOIN r5 ON d.src = r5.doc_id
         |ORDER BY rank_scaled DESC, doc_id LIMIT 20""".stripMargin
    },

    "dedup_minhash_lsh_check" ->
      s"""WITH $pairsCte
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs, TRUE AS recall_ok
        |FROM pairs""".stripMargin,

    "dedup_simhash_check" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_checked,
        | TRUE AS pigeonhole_exact_ok
        |FROM documents WHERE doc_id < 500""".stripMargin,

    "dedup_graph_triangles" ->
      s"""WITH $pairsCte,
        |e AS (SELECT d1, d2 FROM pairs),
        |deg AS (
        |  SELECT doc_id, COUNT(*) AS dg
        |  FROM (SELECT d1 AS doc_id FROM e UNION ALL SELECT d2 FROM e)
        |  GROUP BY doc_id),
        |tri AS (
        |  SELECT COUNT(*) AS t FROM e e1
        |  JOIN e e2 ON e1.d2 = e2.d1
        |  WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.d1 = e1.d1 AND e3.d2 = e2.d2))
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |       (SELECT CAST(SUM((dg * (dg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
        |       (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles""".stripMargin,

    "graph_clustering_coeff" ->
      s"""WITH $pairsCte,
        |e AS (SELECT d1, d2 FROM pairs),
        |corners AS (
        |  SELECT unnest([e1.d1, e1.d2, e2.d2]) AS doc_id
        |  FROM e e1
        |  JOIN e e2 ON e1.d2 = e2.d1
        |  JOIN e e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2),
        |tpn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tri FROM corners GROUP BY 1),
        |deg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dg
        |  FROM (SELECT d1 AS doc_id FROM e UNION ALL SELECT d2 FROM e)
        |  GROUP BY doc_id),
        |pn AS (
        |  SELECT dg, coalesce(tri, 0) AS tri,
        |    CASE WHEN dg >= 2
        |     THEN coalesce(tri, 0) * 10000 // ((dg * (dg - 1)) // 2)
        |     ELSE NULL END AS cc_bp
        |  FROM deg LEFT JOIN tpn USING (doc_id))
        |SELECT dg AS degree, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(tri) AS BIGINT) AS sum_tri,
        |  CAST(SUM(cc_bp) // count(*) AS BIGINT) AS mean_cc_bp
        |FROM pn GROUP BY dg ORDER BY degree""".stripMargin,

    "dedup_graph_degrees" ->
      s"""WITH $pairsCte,
        |deg AS (
        | SELECT doc_id, COUNT(*) AS degree
        | FROM (SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 FROM pairs)
        | GROUP BY doc_id)
        |SELECT degree, COUNT(*) AS n_docs
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,

    "dedup_summary" ->
      """SELECT n_docs, n_uniq_exact, n_uniq_norm,
        | CAST(floor((n_docs - n_uniq_exact) * 10000.0 / n_docs) AS BIGINT) AS exact_dup_bp,
        | CAST(floor((n_docs - n_uniq_norm) * 10000.0 / n_docs) AS BIGINT) AS norm_dup_bp
        |FROM (
        | SELECT COUNT(*) AS n_docs,
        |  COUNT(DISTINCT md5(text)) AS n_uniq_exact,
        |  COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_uniq_norm
        | FROM documents)""".stripMargin,

    "dedup_keep_best" ->
      """SELECT fp, doc_id AS rep_id, n_chars FROM (
        | SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  doc_id, n_chars,
        |  ROW_NUMBER() OVER (
        |    PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |    ORDER BY n_chars DESC, doc_id) AS rn
        | FROM documents)
        |WHERE rn = 1 ORDER BY fp""".stripMargin,

    "dedup_repeated_ngrams" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        | SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        | FROM toks WHERE len(t) >= 8),
        |g AS (
        | SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram FROM pos)
        |SELECT gram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY gram
        |ORDER BY n_occ DESC, gram LIMIT 20""".stripMargin
  )
}
