package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-17 similarity additions — the PERSISTED-INDEX ANN round-trip
  * (the r16 verdict ask): every `sim_*` index so far is built
  * per-session (memoized) and served from memory; production ANN is
  * BUILD-ONCE / QUERY-MANY — the index is written as a cell-bucketed
  * TABLE and every later query batch probes the persisted layout
  * without shuffling or rebuilding it.
  *
  * `sim_knn_ivf_persist` — the integer-exact IVF index
  * ([[DedupQueries5.semCellIndex]]: 8 seed-centroid cells, milli-
  * quantized integer-dot argmax, the hash-green assignment the
  * dedup_semantic oracle already replays) is persisted ONCE per
  * (session, dir) via `bucketBy(8, "cell")` — on a cluster this is
  * the bucketed warehouse table a serving fleet mounts. A query
  * batch then:
  *
  *   1. picks each query's [[NProbe]] nearest cells by the same
  *      integer dot against the 8 broadcast seed centroids;
  *   2. STATICALLY prunes the index scan to those cells
  *      (`cell IN (...)` — the probed cell list is ≤ N_QUERIES ×
  *      NProbe ids of driver model state, the same legitimate
  *      broadcast-model path as the IVF codebooks), which engages
  *      BUCKET PRUNING: the scan physically reads only the probed
  *      buckets' files (BucketingSpec proves the mechanism;
  *      Round17Spec pins this query's fragment);
  *   3. joins the pruned scan to the broadcast probe set on cell and
  *      ranks candidates by (integer dot desc, vec_id asc) — the
  *      `sim_probe_recall` total order, so the WHOLE top-k is
  *      hash-gated where the float-cosine `sim_knn_ivf` is rows-only.
  *
  * Probe-side plan shape (pinned by Round17Spec): bucketed scan →
  * BroadcastHashJoin — the corpus index never moves through a shuffle
  * exchange; the only exchanges in the full query are the
  * query-batch-sized window top-k. At 100 TB: the index write is one
  * bucketed shuffle paid once; each query batch reads
  * NProbe/[[SemCells]] of the data (bucket pruning), broadcasts a
  * query-batch-sized probe set, and shuffles only (q_id, candidate)
  * rows for its own top-k. */
object SimilarityQueries2 {
  type Q = (SparkSession, String) => DataFrame

  /** Must match [[DedupQueries5]]'s cell count (the index being
    * persisted) — seeds are vec_id < SemCells. */
  private val SemCells = 8
  private val NProbe = 2
  private val K = 5
  private val NQ = 5
  /** Probe width for FILTERED queries (r19 verdict ask #5): a ~10%
    * label predicate decimates each probed cell's candidate pool, so
    * the naive 2-probe search starves below K matches — the standard
    * compensation is widening probes until the EXPECTED post-filter
    * pool covers K (E[matches] ≈ probes/8 × selectivity × corpus;
    * 4 probes × 10% × 500 ≥ 5·K at the smallest SF). Pre-filtering
    * the index instead would break cell pruning; post-filtering the
    * final top-K would break recall — widened-probe filter-inside-
    * the-candidate-set keeps both. */
  private val FilterNProbe = 4
  /** Filtered recall@K floor in bp — the annCheck calibration rule
    * (measured worst SF minus one 400 bp pair of the 25-pair
    * denominator): RecallProbe measured 9600/8000/10000 bp at
    * sf0.001/0.01/0.1 vs the exact filtered flat scan, so floor =
    * 8000 − 400. Notably ABOVE the unfiltered 2-probe IVF's 4000 bp —
    * the widened probe more than repays the filter's candidate loss.
    * Deterministic pipeline — a drop below is a real index/pruning
    * regression, not noise. */
  private val FilteredRecallFloorBp = 7600
  /** SQ8 recall@K floor in bp — calibrated per the annCheck rule:
    * measured worst-SF recall minus one 400 bp pair (25-pair
    * denominator). Measured on the reconstruction-cosine ranking:
    * 10000/8800/10000 bp at sf0.001/0.01/0.1 (the sf0.01 misses are
    * near-tie cosine pairs the 8-bit grid flips; deterministic
    * pipeline, exactly reproducible), so floor = 8800 − 400. */
  private val SqRecallFloorBp = 8400

  private def qdot(a: Column, b: Column): Column =
    graft.functions.GraftExpressions.quantized_dot_milli(a, b)

  /** Bucketed-table name of the persisted IVF index for (session, dir)
    * — built once (the ensureBucketedWarehouse discipline; Bench
    * warm-up pays the layout write so the gate entry times the probe
    * read alone). */
  private val ivfWh =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  def ensureIvfWarehouse(s: SparkSession, d: String): String =
    ivfWh.computeIfAbsent((s, d), { _ =>
      val sfx = java.security.MessageDigest.getInstance("SHA-256")
        .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString
      val tbl = s"ivf_idx_$sfx"
      val path = s"${sys.props("java.io.tmpdir")}/graft_ivf_wh_$sfx/$tbl"
      // label rides the index row (r20): a filtered-ANN index stores
      // its filter attributes NEXT TO the vectors (the faiss-with-
      // metadata / Vespa shape) so the predicate applies inside the
      // pruned candidate scan — no second join, no post-filter pass.
      // Unfiltered probes never read the column (Catalyst prunes it).
      DedupQueries5.semCellIndex(s, d)
        .select(col("vec_id"), col("cell"), col("embedding"))
        .join(embeddings(s, d).select(col("vec_id"), col("label")), Seq("vec_id"))
        .write.mode("overwrite")
        .bucketBy(SemCells, "cell").sortBy("vec_id")
        .option("path", path).saveAsTable(tbl)
      tbl
    })

  /** Probe-side fragment (everything BEFORE the per-query top-k):
    * statically-pruned bucketed index scan ⋈ broadcast probe set.
    * Package-visible so Round17Spec pins the plan: bucket pruning
    * engaged, no shuffle exchange anywhere in this fragment (the
    * probe set is localCheckpointed — its own tiny window ran at
    * build time, exactly as a serving fleet receives a finished
    * query batch). */
  private[graft] def ivfPersistProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = s.table(ensureIvfWarehouse(s, d))
    val seeds = embeddings(s, d).filter($"vec_id" < SemCells)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("cemb"))
    val qs = embeddings(s, d).filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val wAff = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"sdot".desc, $"cell".asc)
    val aff = qs.crossJoin(broadcast(seeds))
      .select($"q_id", $"q_emb", $"cell", qdot($"q_emb", $"cemb").as("sdot"))
      .withColumn("pr", row_number().over(wAff)).filter($"pr" <= NProbe)
      .select($"q_id", $"q_emb", $"cell")
      .localCheckpoint() // query-batch-sized; pins the probe set
    // ≤ NQ × NProbe cell ids of driver model state → static IN filter
    // → bucket pruning at the scan (the broadcast-model path)
    val cellIds = aff.select($"cell").distinct().as[Int].collect().sorted
    idx.filter($"cell".isin(cellIds.map(Int.box): _*))
      .join(broadcast(aff), Seq("cell"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", qdot($"q_emb", $"embedding").as("dot"))
  }

  /** FILTERED-ANN probe fragment (r19 verdict ask #5 — production
    * retrieval is predicate + vector: label = X AND top-k by
    * similarity): the same persisted-bucketed-index shape as
    * [[ivfPersistProbe]], with (a) each query carrying its target
    * label (q_id % 10 — the per-query predicate shape), (b) the probe
    * WIDENED to [[FilterNProbe]] cells (recall compensation — see the
    * constant's doc), and (c) the label predicate applied INSIDE the
    * pruned candidate scan against the index's own label column.
    * Bucket pruning is preserved (the scan still reads only probed
    * cells' files); ranking stays the integer quantized dot, so the
    * whole filtered top-k hash-gates against the DuckDB replay where
    * float-ranked variants are rows-only. */
  private[graft] def filteredProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val idx = s.table(ensureIvfWarehouse(s, d))
    val seeds = embeddings(s, d).filter($"vec_id" < SemCells)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("cemb"))
    val qs = embeddings(s, d).filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        ($"vec_id" % 10).cast("int").as("q_label"))
    val wAff = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"sdot".desc, $"cell".asc)
    val aff = qs.crossJoin(broadcast(seeds))
      .select($"q_id", $"q_emb", $"q_label", $"cell",
        qdot($"q_emb", $"cemb").as("sdot"))
      .withColumn("pr", row_number().over(wAff)).filter($"pr" <= FilterNProbe)
      .select($"q_id", $"q_emb", $"q_label", $"cell")
      .localCheckpoint() // query-batch-sized; pins the probe set
    val cellIds = aff.select($"cell").distinct().as[Int].collect().sorted
    idx.filter($"cell".isin(cellIds.map(Int.box): _*))
      .join(broadcast(aff), Seq("cell"))
      .filter($"vec_id" =!= $"q_id" && $"label" === $"q_label")
      .select($"q_id", $"vec_id", qdot($"q_emb", $"embedding").as("dot"))
  }

  /** Exact filtered baseline for the recall gate: the SAME label
    * predicate and integer-dot ranking over the WHOLE corpus (no cell
    * pruning) — what a flat scan with the filter would return. */
  private[graft] def filteredExact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
    val qs = embeddings(s, d).filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        ($"vec_id" % 10).cast("int").as("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
    emb.join(broadcast(qs), $"vec_id" =!= $"q_id" && $"label" === $"q_label")
      .select($"q_id", $"vec_id", qdot($"q_emb", $"embedding").as("dot"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"q_id", $"rank", $"vec_id", $"dot")
  }

  /** SQ8 SCALAR QUANTIZATION codes (the faiss SQ8 shape — the
    * quantization family member between float brute force and PQ):
    * per-dimension milli-int min/max over the corpus (the 64-row
    * model, collected once and folded in as array literals), every
    * vector encoded to 64 uint8 codes q_d = (x_d − mn_d)·255 DIV
    * span_d. All-integer end to end (the established floor(x·1000)
    * milli quantization first, so no cross-engine float-division ulp
    * can enter), which is what lets the WHOLE ranking — scores
    * included — hash-gate against the DuckDB replay, where the
    * float-scored LSH/IVF/PQ rankings are rows-only by contract.
    * Scale: codes are 64 bytes/vector (16× smaller scans than float32
    * — the memory-bandwidth win SQ8 exists for); the model is 128
    * longs of driver state; encoding is one embarrassingly-parallel
    * pass. */
  private def sq8Codes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = embeddings(s, d).select($"vec_id",
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
        .as("xm"))
    val stats = m.select(posexplode($"xm").as(Seq("i", "v")))
      .groupBy($"i").agg(min($"v").as("mn"),
        greatest(max($"v") - min($"v"), lit(1L)).as("span"))
      .orderBy($"i").collect() // 64-row model (the IVF-codebook class)
    val mns = stats.map(_.getLong(1)).toSeq
    val spans = stats.map(_.getLong(2)).toSeq
    m.withColumn("mns", typedlit(mns)).withColumn("spans", typedlit(spans))
      .select($"vec_id",
        expr("zip_with(zip_with(xm, mns, (x, mn) -> x - mn), spans," +
          " (t, sp) -> (t * 255) DIV sp)").as("codes"),
        $"mns", $"spans", $"xm")
  }

  /** SQ8 top-k: DECODE each code back to its integer-milli
    * reconstruction x̂_d = mn_d + (c_d·span_d) DIV 255 (the faiss SQ8
    * semantic — the metric runs on the reconstruction, not the raw
    * codes: raw uint8 codes are shifted non-negative, so their dot
    * does NOT track cosine), then rank by the exact-integer-dot
    * cosine micro-floored through one shared double tree (sqrt and /
    * are correctly rounded on both engines — the sim_mips cos_micro
    * idiom). (score desc, vec_id) total order. */
  private def sq8TopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val xhat = expr("zip_with(zip_with(codes, spans, (c, sp) -> (c * sp) DIV 255)," +
      " mns, (t, mn) -> t + mn)")
    val decoded = sq8Codes(s, d)
      .withColumn("xh", xhat)
      .select($"vec_id", $"xh",
        expr("greatest(aggregate(zip_with(xh, xh, (a, b) -> a * b), 0L," +
          " (acc, x) -> acc + x), 1L)").as("n2"))
    val codes = decoded.repartition(s.sparkContext.defaultParallelism)
    val q = decoded.filter($"vec_id" < NQ)
      .select($"vec_id".as("q_id"), $"xh".as("qx"), $"n2".as("n2q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"score_micro".desc, $"vec_id".asc)
    codes.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        expr("CAST(FLOOR((1000000.0 * CAST(aggregate(zip_with(qx, xh," +
          " (a, b) -> a * b), 0L, (acc, x) -> acc + x) AS DOUBLE))" +
          " / (sqrt(CAST(n2q AS DOUBLE)) * sqrt(CAST(n2 AS DOUBLE)))) AS BIGINT)")
          .as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"q_id", $"rank", $"vec_id", $"score_micro")
  }

  val queries: Map[String, Q] = Map(
    "sim_knn_sq8" -> ((s, d) => {
      import s.implicits._
      sq8TopK(s, d).orderBy($"q_id", $"rank")
    }),

    // SQ8 CODEC AUDIT — the reconstruction-error table a quantization
    // rollout reads before trusting the codes: per-corpus exact
    // integer error mass |xm − x̂m| in milli units (worst vector, mean
    // per dimension), all-integer so it hash-gates. The error bound
    // is span/255 per dim by construction — the audit proves the
    // implementation actually meets it (max_dim_err ≤ ceil(span/255)).
    "sim_sq8_error" -> ((s, d) => {
      import s.implicits._
      sq8Codes(s, d)
        .withColumn("xh",
          expr("zip_with(zip_with(codes, spans, (c, sp) -> (c * sp) DIV 255)," +
            " mns, (t, mn) -> t + mn)"))
        .select($"vec_id",
          expr("aggregate(zip_with(xm, xh, (a, b) -> abs(a - b)), 0L," +
            " (acc, x) -> acc + x)").as("err_sum"),
          expr("array_max(zip_with(xm, xh, (a, b) -> abs(a - b)))").as("err_max"))
        .agg(count(lit(1)).as("n_vectors"),
          sum($"err_sum").as("total_abs_err_milli"),
          max($"err_max").as("max_dim_err_milli"),
          max($"err_sum").as("max_vec_err_milli"))
        .selectExpr("n_vectors", "total_abs_err_milli",
          "total_abs_err_milli DIV (n_vectors * 64) AS mean_dim_err_milli",
          "max_dim_err_milli", "max_vec_err_milli")
    }),

    // SQ8 quality gate: aggregate recall@K of the int8-code ranking
    // vs the exact float-cosine top-K (floor calibrated from the
    // measured worst SF minus one 400 bp pair — the annCheck rule).
    "sim_knn_sq8_check" -> ((s, d) => {
      import s.implicits._
      val exact = {
        val emb = embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
        val qd = embeddings(s, d).filter($"vec_id" < NQ)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
        emb.join(broadcast(qd), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            graft.functions.GraftExpressions
              .cosine_similarity($"q_emb", $"embedding").as("cosine"))
          .withColumn("rank", row_number().over(w))
          .filter($"rank" <= K).select($"q_id", $"vec_id")
      }
      val hits = sq8TopK(s, d).select($"q_id", $"vec_id")
        .join(exact, Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_hits"))
      val nq = embeddings(s, d).filter($"vec_id" < NQ)
        .agg(count(lit(1)).as("n_queries"))
      nq.crossJoin(broadcast(hits)) // single-row side
        .select($"n_queries",
          ($"n_hits" * 10000L / ($"n_queries" * K) >= SqRecallFloorBp)
            .as("recall_ok"))
    }),

    "sim_knn_ivf_persist" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
      ivfPersistProbe(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"dot")
        .orderBy($"q_id", $"rank")
    }),

    // FILTERED ANN over the persisted IVF index: label predicate +
    // vector top-k in one probe (see filteredProbe). Integer ranking
    // → the whole filtered top-k hash-gates.
    "sim_knn_filtered" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
      filteredProbe(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"dot")
        .orderBy($"q_id", $"rank")
    }),

    // Filtered-recall gate: the widened-probe filtered search vs the
    // exact filtered flat scan, floored per the annCheck rule.
    "sim_knn_filtered_check" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
      val ann = filteredProbe(s, d)
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= K).select($"q_id", $"vec_id")
      val hits = ann.join(filteredExact(s, d).select($"q_id", $"vec_id"),
          Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_hits"))
      val nq = embeddings(s, d).filter($"vec_id" < NQ)
        .agg(count(lit(1)).as("n_queries"))
      nq.crossJoin(broadcast(hits)) // single-row side
        .select($"n_queries",
          ($"n_hits" * 10000L / ($"n_queries" * K) >= FilteredRecallFloorBp)
            .as("recall_ok"))
    })
  )

  val oracles: Map[String, String] = Map(
    // Full replay of the SQ8 encode + decode + rank: same milli
    // quantization, same per-dim min/span model, same code and
    // reconstruction formulas, same micro-floored cosine double tree
    // — scores hash-gate exactly.
    "sim_knn_sq8" ->
      s"""WITH m AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xm
         |  FROM embeddings),
         |dim AS (
         |  SELECT i, MIN(xm[i]) AS mn,
         |    GREATEST(MAX(xm[i]) - MIN(xm[i]), 1) AS span
         |  FROM m CROSS JOIN range(1, 65) t(i) GROUP BY i),
         |model AS (
         |  SELECT list(mn ORDER BY i) AS mns, list(span ORDER BY i) AS spans
         |  FROM dim),
         |dn AS MATERIALIZED (
         |  SELECT vec_id, xh,
         |    GREATEST(CAST(list_sum(list_transform(range(1, 65),
         |      i -> xh[i] * xh[i])) AS BIGINT), 1) AS n2
         |  FROM (
         |    SELECT vec_id, list_transform(range(1, 65),
         |      i -> mns[i] + ((((xm[i] - mns[i]) * 255) // spans[i])
         |        * spans[i]) // 255) AS xh
         |    FROM m CROSS JOIN model)),
         |scored AS (
         |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |    CAST(FLOOR((1000000.0 * CAST(CAST(list_sum(list_transform(
         |      range(1, 65), i -> q.xh[i] * e.xh[i])) AS BIGINT) AS DOUBLE))
         |      / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(e.n2 AS DOUBLE))))
         |      AS BIGINT) AS score_micro
         |  FROM dn q JOIN dn e
         |    ON q.vec_id < $NQ AND e.vec_id != q.vec_id)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, vec_id, score_micro FROM (
         |  SELECT q_id, vec_id, score_micro,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY score_micro DESC, vec_id ASC) AS rn
         |  FROM scored)
         |WHERE rn <= $K ORDER BY q_id, rank""".stripMargin,

    // Same model CTEs, error mass on the reconstruction.
    "sim_sq8_error" ->
      s"""WITH m AS MATERIALIZED (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xm
         |  FROM embeddings),
         |dim AS (
         |  SELECT i, MIN(xm[i]) AS mn,
         |    GREATEST(MAX(xm[i]) - MIN(xm[i]), 1) AS span
         |  FROM m CROSS JOIN range(1, 65) t(i) GROUP BY i),
         |model AS (
         |  SELECT list(mn ORDER BY i) AS mns, list(span ORDER BY i) AS spans
         |  FROM dim),
         |errs AS (
         |  SELECT vec_id,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> abs(xm[i] - (mns[i] + ((((xm[i] - mns[i]) * 255) // spans[i])
         |        * spans[i]) // 255)))) AS BIGINT) AS err_sum,
         |    CAST(list_max(list_transform(range(1, 65),
         |      i -> abs(xm[i] - (mns[i] + ((((xm[i] - mns[i]) * 255) // spans[i])
         |        * spans[i]) // 255)))) AS BIGINT) AS err_max
         |  FROM m CROSS JOIN model)
         |SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(SUM(err_sum) AS BIGINT) AS total_abs_err_milli,
         |  CAST(SUM(err_sum) AS BIGINT) // (CAST(count(*) AS BIGINT) * 64)
         |    AS mean_dim_err_milli,
         |  MAX(err_max) AS max_dim_err_milli,
         |  MAX(err_sum) AS max_vec_err_milli
         |FROM errs""".stripMargin,

    // Quality gate: the oracle pins the invariant as literal TRUE
    // (the sim_knn_lsh_check convention) — a quantization or ranking
    // regression below the calibrated floor fails the hash.
    "sim_knn_sq8_check" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < $NQ""".stripMargin,

    // Full integer replay of the FILTERED probe: the same cell CTE,
    // the widened 4-probe affinity, the label predicate inside the
    // candidate set, the same (dot desc, vec_id) total order — a
    // pruning or predicate regression flips the hash.
    "sim_knn_filtered" ->
      s"""WITH ${DedupQueries5.semCellsCte},
         |qs AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |         CAST(vec_id % 10 AS INTEGER) AS q_label
         |       FROM embeddings WHERE vec_id < $NQ),
         |aff AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, s.vec_id AS cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${DedupQueries5.duckQdot.format("q.q_emb", "s.embedding")} DESC,
         |                 s.vec_id ASC) AS pr
         |    FROM qs q JOIN embeddings s ON s.vec_id < $SemCells)
         |  WHERE pr <= $FilterNProbe),
         |cand AS MATERIALIZED (
         |  SELECT a.q_id, c.vec_id,
         |    ${DedupQueries5.duckQdot.format("q.q_emb", "e.embedding")} AS dot
         |  FROM aff a JOIN cells c ON c.cell = a.cell
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN qs q ON q.q_id = a.q_id
         |  WHERE c.vec_id != a.q_id AND e.label = q.q_label)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, vec_id, dot FROM (
         |  SELECT q_id, vec_id, dot,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY dot DESC, vec_id ASC) AS rn
         |  FROM cand)
         |WHERE rn <= $K ORDER BY q_id, rank""".stripMargin,

    // Quality gate: the oracle pins the invariant as literal TRUE
    // (the sim_knn_lsh_check convention).
    "sim_knn_filtered_check" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
         |FROM embeddings WHERE vec_id < $NQ""".stripMargin,

    // Full integer replay: the same cell assignment CTE the
    // dedup_semantic oracle uses, the same 2-probe affinity, the same
    // (dot desc, vec_id) total order.
    "sim_knn_ivf_persist" ->
      s"""WITH ${DedupQueries5.semCellsCte},
         |qs AS (SELECT vec_id AS q_id, embedding AS q_emb
         |       FROM embeddings WHERE vec_id < $NQ),
         |aff AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, s.vec_id AS cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${DedupQueries5.duckQdot.format("q.q_emb", "s.embedding")} DESC,
         |                 s.vec_id ASC) AS pr
         |    FROM qs q JOIN embeddings s ON s.vec_id < $SemCells)
         |  WHERE pr <= $NProbe),
         |cand AS MATERIALIZED (
         |  SELECT a.q_id, c.vec_id,
         |    ${DedupQueries5.duckQdot.format("q.q_emb", "e.embedding")} AS dot
         |  FROM aff a JOIN cells c ON c.cell = a.cell
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN qs q ON q.q_id = a.q_id
         |  WHERE c.vec_id != a.q_id)
         |SELECT q_id, CAST(rn AS BIGINT) AS rank, vec_id, dot FROM (
         |  SELECT q_id, vec_id, dot,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY dot DESC, vec_id ASC) AS rn
         |  FROM cand)
         |WHERE rn <= $K ORDER BY q_id, rank""".stripMargin
  )
}
