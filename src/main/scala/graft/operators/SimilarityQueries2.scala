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
      DedupQueries5.semCellIndex(s, d)
        .select(col("vec_id"), col("cell"), col("embedding"))
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

  val queries: Map[String, Q] = Map(
    "sim_knn_ivf_persist" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"dot".desc, $"vec_id".asc)
      ivfPersistProbe(s, d)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"dot")
        .orderBy($"q_id", $"rank")
    })
  )

  val oracles: Map[String, String] = Map(
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
