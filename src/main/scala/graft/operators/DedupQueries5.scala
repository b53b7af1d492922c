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
  *      transitively via the shared pointer-doubling CC engine.
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

  /** Milli-quantized embedding → array<long>. */
  private def qvec(c: Column): Column =
    transform(c, x => floor(x.cast("double") * 1000).cast("long"))

  /** Integer dot product of two quantized arrays. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  val queries: Map[String, Q] = Map(
    "dedup_semantic" -> ((s, d) => {
      import s.implicits._
      val emb = embeddings(s, d)
        .select($"vec_id", qvec($"embedding").as("q"))
        .repartition(s.sparkContext.defaultParallelism)
      val seeds = embeddings(s, d).filter($"vec_id" < SemCells)
        .select($"vec_id".cast("int").as("cell"), qvec($"embedding").as("cq"))
      val wCell = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"dot".desc, $"cell".asc)
      // the built index: (vec_id, cell, ‖v‖², qv) — materialized once,
      // read by both sides of the candidate join (on a cluster this is
      // the bucketBy(cell) table BucketingSpec pins)
      val cells = emb.crossJoin(broadcast(seeds))
        .select($"vec_id", $"cell", $"q", qdot($"q", $"cq").as("dot"))
        .withColumn("rn", row_number().over(wCell)).filter($"rn" === 1)
        .select($"vec_id", $"cell", $"q", qdot($"q", $"q").as("n2"))
        .repartition(s.sparkContext.defaultParallelism, $"cell")
        .localCheckpoint()
      val a = cells.select($"cell", $"vec_id".as("v1"), $"q".as("q1"), $"n2".as("na2"))
      val b = cells.select($"cell", $"vec_id".as("v2"), $"q".as("q2"), $"n2".as("nb2"))
      val pairs = a.join(b, Seq("cell")).filter($"v1" < $"v2")
        .withColumn("dot", qdot($"q1", $"q2"))
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

  private val duckQdot =
    "CAST(list_sum(list_transform(range(1, 65), i -> " +
      "CAST(floor(CAST(%s[i] AS DOUBLE) * 1000) AS BIGINT) * " +
      "CAST(floor(CAST(%s[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "dedup_semantic" ->
      s"""WITH RECURSIVE cells AS MATERIALIZED (
         |  SELECT vec_id, cell, n2 FROM (
         |    SELECT e.vec_id, s.vec_id AS cell,
         |      ${duckQdot.format("e.embedding", "s.embedding")} AS dot,
         |      ${duckQdot.format("e.embedding", "e.embedding")} AS n2,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${duckQdot.format("e.embedding", "s.embedding")} DESC,
         |                 s.vec_id ASC) AS rn
         |    FROM embeddings e
         |    JOIN embeddings s ON s.vec_id < $SemCells) t
         |  WHERE rn = 1),
         |pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2
         |  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id
         |  WHERE ${duckQdot.format("ea.embedding", "eb.embedding")} > 0
         |    AND 400 * ${duckQdot.format("ea.embedding", "eb.embedding")}
         |        * ${duckQdot.format("ea.embedding", "eb.embedding")}
         |      > 49 * a.n2 * b.n2),
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
