package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-16 dedup additions — EMBEDDING-SPACE SEMANTIC DEDUP, the
  * SemDeDup curation verdict (Abbas et al. 2023): `sim_neardup_pairs`
  * lists near-duplicate pairs; this op turns them into the per-doc
  * KEEP/DROP decision a curation pipeline actually executes.
  *
  * `dedup_semantic` — four stages, none all-pairs:
  *
  *   1. IVF CELL ASSIGNMENT — every vector lands in the cell of its
  *      nearest of [[SemCells]] seed centroids (the first 8 vectors,
  *      the `ml_kmeans_lloyd` seed discipline), by argmax of the
  *      MILLI-QUANTIZED integer dot product with a (dot desc, cell
  *      asc) total order — exact in both engines, so the whole
  *      index is hash-green where the Lloyd-trained `sim_knn_ivf`
  *      index is rows-only. One corpus × 8-broadcast pass.
  *   2. WITHIN-CELL THRESHOLD — candidate pairs come from the cell
  *      equi-join only (SemDeDup's approximation is exactly this:
  *      near-dups land in the same cell); cosine > 0.35 is decided in
  *      integers: dot > 0 ∧ 400·dot² > 49·‖a‖²·‖b‖² (0.35 = 7/20;
  *      |qv| ≤ 578 ⇒ dot ≤ 2.2e7, 400·dot² ≤ 1.9e17 — no overflow).
  *   3. CONNECTED COMPONENTS — paraphrase families A~B~C collapse
  *      transitively via the shared pointer-doubling CC engine. (The
  *      0.35-cosine graph has a chain-shaped giant component on this
  *      corpus — the loop measures 10 doubling rounds; ~0.45 s/round
  *      of job-scheduling overhead dominates the op's quiet time, not
  *      data volume. At 100 TB rounds stay O(log diameter).)
  *   4. VERDICT — one representative per cluster (minimum vec_id):
  *      every doc gets (cell, cluster_id, n_members, keep), keep ⟺
  *      doc is its cluster's rep. Singletons keep themselves.
  *
  * Scale: the index build is one broadcast pass; the candidate join
  * is cell-keyed (the BucketingSpec layout — on a cluster the corpus
  * persists bucketed by cell, so the join is zero-exchange); pair
  * volume is Σ|cell|², controlled by the cell count (grow cells ∝ √N
  * at 100 TB, exactly the IVF sizing rule). The verdict join is
  * corpus-keyed. Oracle: DuckDB recursive reach closure over the
  * identical integer pairs (the `sim_cluster_reps` pattern).
  */
object DedupQueries5 {
  type Q = (SparkSession, String) => DataFrame

  /** IVF cells for the semantic-dedup index (seeds = vec_id < 8). */
  private val SemCells = 8

  /** Exact milli-quantized integer dot product — the native codegen'd
    * kernel ([[graft.functions.QuantizedDotMilli]]): the HOF chain
    * (transform → zip_with → aggregate) computes the same longs but
    * evaluates interpreted and allocates two long arrays per pair —
    * the within-cell pair join runs millions of these. */
  private def qdot(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.quantized_dot_milli(a, b)

  private val StopList = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The built integer-argmax IVF index: (vec_id, cell, qv, ‖v‖²) —
    * session-memoized (dedup_semantic, sim_cell_stats, and
    * sim_probe_recall all read one build), read by both sides of the candidate
    * join (on a cluster this is the bucketBy(cell) table BucketingSpec
    * pins). Shared by dedup_semantic and sim_cell_stats. */
  private val cellsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def semCells(s: SparkSession, d: String): DataFrame =
    cellsMemo.computeIfAbsent((s, d), _ => semCellsRun(s, d))
  /** Package-visible accessor: [[SimilarityQueries2]] persists this
    * index as the bucketed warehouse table (build-once/query-many). */
  private[operators] def semCellIndex(s: SparkSession, d: String): DataFrame =
    semCells(s, d)
  private def semCellsRun(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d)
      .select($"vec_id", $"embedding")
      .repartition(s.sparkContext.defaultParallelism)
    val seeds = embeddings(s, d).filter($"vec_id" < SemCells)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("cemb"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"dot".desc, $"cell".asc)
    emb.crossJoin(broadcast(seeds))
      .select($"vec_id", $"cell", $"embedding", qdot($"embedding", $"cemb").as("dot"))
      .withColumn("rn", row_number().over(wCell)).filter($"rn" === 1)
      .select($"vec_id", $"cell", $"embedding", qdot($"embedding", $"embedding").as("n2"))
      .repartition(s.sparkContext.defaultParallelism, $"cell")
      .localCheckpoint()
  }

  val queries: Map[String, Q] = Map(
    // END-TO-END CURATION FUNNEL — the four-stage drop report every
    // LLM-data curation run publishes (RefinedWeb/FineWeb style):
    //   1. exact_dedup     keep min doc per md5(normalized text)
    //   2. neardup_dedup   among survivors, keep one rep per
    //                      jaccard≥0.5 connected component (the
    //                      df-capped shingle substrate + shared CC)
    //   3. quality_filter  ≥30 tokens and stopword share in
    //                      [5%, 60%] — text_quality's gate, decided
    //                      in exact integer cross-multiplication
    //   4. lang_filter     the text_lang_id marker heuristic must
    //                      fire (unidentifiable language → drop)
    // Output: per-stage docs_in/docs_kept/drop_bp — the funnel curve.
    // Scale: stage 1 is one hash groupBy; stage 2 rides the memoized
    // banded substrate and the pointer-doubling CC (never all-pairs);
    // stages 3–4 are narrow filters; every count is an aggregate.
    "dedup_curation_funnel" -> ((s, d) => {
      import s.implicits._
      val wEx = org.apache.spark.sql.expressions.Window
        .partitionBy($"fp").orderBy($"doc_id")
      val exact = documents(s, d)
        .select($"doc_id", md5(graft.functions.TextFunctions.normalize($"text")).as("fp"))
        .withColumn("rn", row_number().over(wEx)).filter($"rn" === 1)
        .select($"doc_id").localCheckpoint() // survivor ids (narrow)
      val sp = DedupQueries.jaccardPairs(s, d).select($"d1", $"d2")
        .join(exact.select($"doc_id".as("d1")), Seq("d1"))
        .join(exact.select($"doc_id".as("d2")), Seq("d2"))
      val labels = ConnectedComponents.labels(s, sp, "dedup_curation_funnel")
      val nd = exact
        .join(labels.select($"id".as("doc_id"), $"lab"), Seq("doc_id"), "left")
        .filter($"lab".isNull || $"lab" === $"doc_id")
        .select($"doc_id").localCheckpoint()
      val toks = split($"text", " ")
      val qual = nd.join(documents(s, d), Seq("doc_id"))
        .select($"doc_id", $"text",
          size(toks).cast("long").as("ntok"),
          size(filter(toks, t => t.isin(StopList.map(lit(_)): _*)))
            .cast("long").as("nstop"))
        .filter($"ntok" >= 30 &&
          lit(20L) * $"nstop" >= $"ntok" && lit(5L) * $"nstop" <= lit(3L) * $"ntok")
        .localCheckpoint()
      val lng = qual.filter(
        $"text".contains(" the ") || $"text".contains(" el ") ||
          $"text".contains(" der ") || $"text".contains(" le ") ||
          $"text".contains("的"))
        .select($"doc_id")
      def cnt(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
      def stage(id: Int, name: String, in: DataFrame, kept: DataFrame) =
        cnt(in, "docs_in").crossJoin(broadcast(cnt(kept, "docs_kept")))
          .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
            $"docs_in", $"docs_kept",
            // GREATEST guard: an emptied stage must report 0, not
            // trip ANSI divide-by-zero
            expr("((docs_in - docs_kept) * 10000) DIV GREATEST(docs_in, 1)").as("drop_bp"))
      Seq(
        stage(1, "exact_dedup", documents(s, d), exact),
        stage(2, "neardup_dedup", exact, nd),
        stage(3, "quality_filter", nd, qual),
        stage(4, "lang_filter", qual, lng))
        .reduce(_ unionByName _).orderBy($"stage_id")
    }),

    // IVF INDEX-HEALTH diagnostic over the same integer cell
    // assignment dedup_semantic searches: per-cell population, the
    // balance read (max/mean in basis points — a hot cell bounds both
    // probe latency and the within-cell pair mass Σ|cell|²), and the
    // cell's mean quantized vector norm. The table an ANN deployment
    // checks before trusting its recall numbers.
    "sim_cell_stats" -> ((s, d) => {
      import s.implicits._
      val cells = semCells(s, d)
      val per = cells.groupBy($"cell")
        .agg(count(lit(1)).as("n_vecs"), sum($"n2").as("sum_n2"))
      val tot = per.agg(count(lit(1)).as("n_cells"), sum($"n_vecs").as("n_total"),
        max($"n_vecs").as("n_max"))
      per.crossJoin(broadcast(tot))
        .selectExpr("cell", "n_vecs",
          "(10000 * n_vecs * n_cells) DIV n_total AS share_of_mean_bp",
          "sum_n2 DIV n_vecs AS mean_norm2",
          "(10000 * n_max * n_cells) DIV n_total AS max_imbalance_bp")
        .orderBy($"cell")
    }),

    // RECALL-vs-nProbe OPERATING CURVE for the integer-argmax cell
    // index — the tuning table an IVF deployment reads before fixing
    // its probe count (the dedup_lsh_tuning discipline applied to the
    // semantic index): exact top-5 neighbors per query vector vs the
    // cell-restricted top-5 at nProbe ∈ {1, 2, 4}, with the candidate
    // volume each probe level pays. All integer dots under total
    // orders, so the whole curve is hash-green — unlike the
    // float-ranked sim_knn_ivf lists, which are rows-only. ONE
    // corpus × 5-query scoring pass feeds the exact ranks and every
    // probe level (filters, not re-scores).
    "sim_probe_recall" -> ((s, d) => {
      import s.implicits._
      val cells = semCells(s, d)
      val qs = cells.filter($"vec_id" < 5)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      val seeds = embeddings(s, d).filter($"vec_id" < SemCells)
        .select($"vec_id".cast("int").as("cell"), $"embedding".as("cemb"))
      val affinity = qs.crossJoin(broadcast(seeds))
        .select($"q_id", $"cell", qdot($"q_emb", $"cemb").as("sdot"))
      val wAff = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"sdot".desc, $"cell".asc)
      val affRank = affinity.withColumn("pr", row_number().over(wAff))
        .select($"q_id", $"cell", $"pr").localCheckpoint() // 5×8 rows
      val scored = cells.join(broadcast(qs), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", $"cell", qdot($"q_emb", $"embedding").as("dot"))
        .localCheckpoint() // 5 × corpus — the sim_knn scoring bound
      val wTop = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
      val exact = scored.withColumn("rn", row_number().over(wTop))
        .filter($"rn" <= 5).select($"q_id", $"vec_id").localCheckpoint()
      Seq(1, 2, 4).map { p =>
        val pc = affRank.filter($"pr" <= p).select($"q_id", $"cell")
        val cand = scored.join(broadcast(pc), Seq("q_id", "cell"))
        val approx = cand.withColumn("rn", row_number().over(wTop))
          .filter($"rn" <= 5).select($"q_id", $"vec_id")
        val hit = approx.join(exact, Seq("q_id", "vec_id"))
          .groupBy($"q_id").agg(count(lit(1)).as("n_hit"))
        val nc = cand.groupBy($"q_id").agg(count(lit(1)).as("n_candidates"))
        qs.select($"q_id")
          .join(nc, Seq("q_id"), "left").join(hit, Seq("q_id"), "left")
          .select($"q_id", lit(p.toLong).as("n_probe"),
            coalesce($"n_candidates", lit(0L)).as("n_candidates"),
            expr("coalesce(n_hit, 0) * 10000 DIV 5").as("recall_bp"))
      }.reduce(_ unionByName _).orderBy($"q_id", $"n_probe")
    }),

    "dedup_semantic" -> ((s, d) => {
      import s.implicits._
      val cells = semCells(s, d)
      val a = cells.select($"cell", $"vec_id".as("v1"), $"embedding".as("e1"), $"n2".as("na2"))
      val b = cells.select($"cell", $"vec_id".as("v2"), $"embedding".as("e2"), $"n2".as("nb2"))
      val pairs = a.join(b, Seq("cell")).filter($"v1" < $"v2")
        .withColumn("dot", qdot($"e1", $"e2"))
        .filter($"dot" > 0 &&
          lit(400L) * $"dot" * $"dot" > lit(49L) * $"na2" * $"nb2")
        .select($"v1", $"v2")
      val labels = ConnectedComponents.labels(s, pairs, "dedup_semantic")
      val verdict = cells.select($"vec_id", $"cell")
        .join(labels.select($"id".as("vec_id"), $"lab"), Seq("vec_id"), "left")
        .select($"vec_id", $"cell", coalesce($"lab", $"vec_id").as("cluster_id"))
      val sizes = verdict.groupBy($"cluster_id".as("cid"))
        .agg(count(lit(1)).as("n_members"))
      verdict.join(sizes, $"cluster_id" === $"cid")
        .select($"vec_id", $"cell", $"cluster_id", $"n_members",
          ($"vec_id" === $"cluster_id").as("keep"))
        .orderBy($"vec_id")
    })
  )

  private[operators] val duckQdot =
    "CAST(list_sum(list_transform(range(1, 65), i -> " +
      "CAST(floor(CAST(%s[i] AS DOUBLE) * 1000) AS BIGINT) * " +
      "CAST(floor(CAST(%s[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)"

  /** Shared cells CTE body of the integer-argmax IVF index (DuckDB
    * replay of [[semCells]]). */
  private[operators] lazy val semCellsCte: String =
    s"""cells AS MATERIALIZED (
       |  SELECT vec_id, cell, n2 FROM (
       |    SELECT e.vec_id, s.vec_id AS cell,
       |      ${duckQdot.format("e.embedding", "s.embedding")} AS dot,
       |      ${duckQdot.format("e.embedding", "e.embedding")} AS n2,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${duckQdot.format("e.embedding", "s.embedding")} DESC,
       |                 s.vec_id ASC) AS rn
       |    FROM embeddings e
       |    JOIN embeddings s ON s.vec_id < $SemCells) t
       |  WHERE rn = 1)""".stripMargin

  /** Shared within-cell threshold-pair CTE (reads `cells`): the exact
    * integer cosine > 0.35 rule over the cell equi-join. */
  private[operators] lazy val semPairsCte: String =
    s"""pairs AS MATERIALIZED (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2
       |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE ${duckQdot.format("ea.embedding", "eb.embedding")} > 0
       |    AND 400 * ${duckQdot.format("ea.embedding", "eb.embedding")}
       |        * ${duckQdot.format("ea.embedding", "eb.embedding")}
       |      > 49 * a.n2 * b.n2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_probe_recall" ->
      s"""WITH $semCellsCte,
         |qs AS (SELECT vec_id AS q_id, embedding AS q_emb
         |       FROM embeddings WHERE vec_id < 5),
         |sc AS MATERIALIZED (
         |  SELECT q.q_id, c.vec_id, c.cell,
         |    ${duckQdot.format("q.q_emb", "e.embedding")} AS dot
         |  FROM qs q JOIN cells c ON c.vec_id != q.q_id
         |  JOIN embeddings e ON e.vec_id = c.vec_id),
         |ex AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id,
         |      row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, vec_id) AS rn
         |    FROM sc) WHERE rn <= 5),
         |aff AS (
         |  SELECT q_id, cell,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sdot DESC, cell) AS pr
         |  FROM (
         |    SELECT q.q_id, s.vec_id AS cell,
         |      ${duckQdot.format("q.q_emb", "s.embedding")} AS sdot
         |    FROM qs q JOIN embeddings s ON s.vec_id < $SemCells)),
         |np(n_probe) AS (VALUES (1), (2), (4)),
         |cand AS MATERIALIZED (
         |  SELECT n.n_probe, sc.q_id, sc.vec_id, sc.dot
         |  FROM sc JOIN aff a ON sc.q_id = a.q_id AND sc.cell = a.cell
         |  JOIN np n ON a.pr <= n.n_probe),
         |ap AS (
         |  SELECT n_probe, q_id, vec_id FROM (
         |    SELECT n_probe, q_id, vec_id,
         |      row_number() OVER (PARTITION BY n_probe, q_id
         |        ORDER BY dot DESC, vec_id) AS rn
         |    FROM cand) WHERE rn <= 5),
         |hit AS (
         |  SELECT n_probe, q_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM ap JOIN ex USING (q_id, vec_id) GROUP BY 1, 2),
         |nc AS (
         |  SELECT n_probe, q_id, CAST(count(*) AS BIGINT) AS n_candidates
         |  FROM cand GROUP BY 1, 2)
         |SELECT q.q_id, CAST(n.n_probe AS BIGINT) AS n_probe,
         |  coalesce(nc.n_candidates, 0) AS n_candidates,
         |  coalesce(h.n_hit, 0) * 10000 // 5 AS recall_bp
         |FROM qs q CROSS JOIN np n
         |LEFT JOIN nc ON nc.q_id = q.q_id AND nc.n_probe = n.n_probe
         |LEFT JOIN hit h ON h.q_id = q.q_id AND h.n_probe = n.n_probe
         |ORDER BY q.q_id, n_probe""".stripMargin,

    "sim_cell_stats" ->
      s"""WITH $semCellsCte,
         |per AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(SUM(n2) AS BIGINT) AS sum_n2
         |  FROM cells GROUP BY cell),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(SUM(n_vecs) AS BIGINT) AS n_total,
         |    CAST(MAX(n_vecs) AS BIGINT) AS n_max
         |  FROM per)
         |SELECT CAST(cell AS INTEGER) AS cell, n_vecs,
         |  (10000 * n_vecs * n_cells) // n_total AS share_of_mean_bp,
         |  sum_n2 // n_vecs AS mean_norm2,
         |  (10000 * n_max * n_cells) // n_total AS max_imbalance_bp
         |FROM per, tot ORDER BY cell""".stripMargin,
    "dedup_curation_funnel" ->
      s"""WITH RECURSIVE ${DedupQueries.pairsCte},
         |norm AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |exd AS MATERIALIZED (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM norm) WHERE rn = 1),
         |sp AS MATERIALIZED (
         |  SELECT d1, d2 FROM pairs
         |  JOIN exd e1 ON d1 = e1.doc_id JOIN exd e2 ON d2 = e2.doc_id),
         |edges AS (SELECT d1 AS src, d2 AS dst FROM sp
         |          UNION ALL SELECT d2, d1 FROM sp),
         |reach(id, lab) AS (
         |  SELECT doc_id, doc_id FROM exd
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
         |cc AS (SELECT id, MIN(lab) AS lab FROM reach GROUP BY id),
         |nd AS MATERIALIZED (SELECT id AS doc_id FROM cc WHERE id = lab),
         |qual AS MATERIALIZED (
         |  SELECT doc_id FROM (
         |    SELECT n.doc_id,
         |      CAST(len(string_split(d.text, ' ')) AS BIGINT) AS ntok,
         |      CAST(len(list_filter(string_split(d.text, ' '),
         |        x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS nstop,
         |      d.text
         |    FROM nd n JOIN documents d USING (doc_id))
         |  WHERE ntok >= 30 AND 20 * nstop >= ntok AND 5 * nstop <= 3 * ntok),
         |lng AS (
         |  SELECT q.doc_id FROM qual q JOIN documents d USING (doc_id)
         |  WHERE d.text LIKE '% the %' OR d.text LIKE '% el %'
         |     OR d.text LIKE '% der %' OR d.text LIKE '% le %'
         |     OR d.text LIKE '%的%'),
         |c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM exd),
         |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
         |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qual),
         |c4 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lng)
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_id, 'exact_dedup' AS stage,
         |    c0.n AS docs_in, c1.n AS docs_kept,
         |    ((c0.n - c1.n) * 10000) // GREATEST(c0.n, 1) AS drop_bp FROM c0, c1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), 'neardup_dedup', c1.n, c2.n,
         |    ((c1.n - c2.n) * 10000) // GREATEST(c1.n, 1) FROM c1, c2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), 'quality_filter', c2.n, c3.n,
         |    ((c2.n - c3.n) * 10000) // GREATEST(c2.n, 1) FROM c2, c3
         |  UNION ALL
         |  SELECT CAST(4 AS BIGINT), 'lang_filter', c3.n, c4.n,
         |    ((c3.n - c4.n) * 10000) // GREATEST(c3.n, 1) FROM c3, c4)
         |ORDER BY stage_id""".stripMargin,

    "dedup_semantic" ->
      s"""WITH RECURSIVE $semCellsCte,
         |$semPairsCte,
         |edges AS (SELECT v1 AS src, v2 AS dst FROM pairs
         |          UNION ALL SELECT v2, v1 FROM pairs),
         |reach(id, lab) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.id = e.dst),
         |lab AS (SELECT id, MIN(lab) AS lab FROM reach GROUP BY id),
         |verdict AS (
         |  SELECT c.vec_id, CAST(c.cell AS INTEGER) AS cell, l.lab AS cluster_id
         |  FROM cells c JOIN lab l ON l.id = c.vec_id),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |          FROM verdict GROUP BY cluster_id)
         |SELECT v.vec_id, v.cell, v.cluster_id, s.n_members,
         |  v.vec_id = v.cluster_id AS keep
         |FROM verdict v JOIN sizes s USING (cluster_id)
         |ORDER BY v.vec_id""".stripMargin
  )
}
