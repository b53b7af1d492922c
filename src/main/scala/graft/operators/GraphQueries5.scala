package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-15 graph additions over the document similarity graph:
  *
  *  - `graph_katz_centrality` — Katz centrality, the attenuation-sum
  *    cousin of PageRank (credit flows along ALL walks, damped per
  *    hop, with a constant per-node base injection instead of a
  *    degree-normalized redistribution): x ← β + α·A·x for 4 rounds,
  *    β = 1000 milli, α = 0.2. Katz ranks low-degree nodes attached
  *    to hubs higher than PageRank does — the "who sits NEXT to the
  *    near-dup mass" view the pagerank/HITS pair doesn't give.
  *  - `graph_component_census` — component SIZE HISTOGRAM of the
  *    near-dup graph (singletons included): the one-line answer to
  *    "is dedup facing confetti (all pairs) or a few giant blobs?"
  *    that decides banding parameters and cluster-rep strategy
  *    before any clustering runs. Engine = the shared pointer-
  *    doubling ConnectedComponents (the labels dedup_cluster_reps
  *    ships), re-aggregated by size.
  *
  * Exactness: Katz state is integer milli with positive floor
  * division each round (x' = 1000 + (200·Σx_nbr) DIV 1000 — same op
  * tree in the unrolled oracle CTEs; all terms positive, so Spark's
  * truncating DIV and DuckDB's flooring // agree); the census is
  * pure integer counting on the oracle's recursive-closure labels.
  *
  * Scale: Katz rounds are one keyed join + one keyed aggregate over
  * the edge list each (the PageRank loop contract), pointer-
  * checkpointed; the census adds two keyed aggregates over the
  * component labels. Nothing touches the corpus after the shared
  * pair substrate.
  */
object GraphQueries5 {
  type Q = (SparkSession, String) => DataFrame

  /** Katz attenuation rounds (α=0.2 → a 5-hop walk carries ≈3e-4 of
    * a direct edge's weight — below milli resolution, so more rounds
    * change nothing visible). */
  private val KatzRounds = 4

  val queries: Map[String, Q] = Map(
    "graph_katz_centrality" -> ((s, d) => {
      import s.implicits._
      val edges = GraphQueries.simEdges(s, d)
      val loopParts = 4
      var x = edges.select($"src".as("doc_id")).distinct()
        .withColumn("x", lit(1000L))
        .repartition(loopParts, $"doc_id").localCheckpoint()
      for (_ <- 1 to KatzRounds) {
        // every active vertex has ≥1 neighbor (it came from an edge),
        // so the inner join keeps the full vertex set each round
        x = edges
          .join(x.select($"doc_id".as("src"), $"x"), Seq("src"))
          .groupBy($"dst".as("doc_id"))
          .agg(sum($"x").as("sx"))
          .selectExpr("doc_id", "1000 + (200 * sx) DIV 1000 AS x")
          .repartition(loopParts, $"doc_id").localCheckpoint()
      }
      val deg = edges.groupBy($"dst".as("doc_id"))
        .agg(count(lit(1)).as("degree"))
      x.join(deg, Seq("doc_id"))
        .orderBy($"x".desc, $"doc_id".asc).limit(20)
        .select($"doc_id", $"x".as("katz_milli"), $"degree")
    }),

    "graph_component_census" -> ((s, d) => {
      import s.implicits._
      val labels = ConnectedComponents.labels(s,
        DedupQueries.jaccardPairs(s, d).select($"d1", $"d2"),
        "graph_component_census")
      val comps = documents(s, d).select($"doc_id")
        .join(labels.select($"id".as("doc_id"), $"lab"), Seq("doc_id"), "left")
        .select(coalesce($"lab", $"doc_id").as("rep"))
        .groupBy($"rep").agg(count(lit(1)).as("comp_size"))
      val tot = comps.agg(sum($"comp_size").as("n_docs")).localCheckpoint()
      comps.groupBy($"comp_size").agg(count(lit(1)).as("n_components"))
        .crossJoin(broadcast(tot)) // single-row side
        .selectExpr("comp_size", "n_components",
          "comp_size * n_components AS docs_in_size",
          "(10000 * comp_size * n_components) DIV n_docs AS docs_share_bp")
        .orderBy($"comp_size")
    })
  )

  /** One unrolled Katz round: k$i from k${i-1} over the symmetric
    * edge CTE. */
  private def katzRoundSql(i: Int): String =
    s"""k$i AS MATERIALIZED (
       |  SELECT e.dst AS doc_id,
       |    1000 + (200 * CAST(SUM(p.x) AS BIGINT)) // 1000 AS x
       |  FROM edges e JOIN k${i - 1} p ON e.src = p.doc_id
       |  GROUP BY e.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_katz_centrality" ->
      s"""WITH ${DedupQueries.pairsCte},
         |edges AS MATERIALIZED (
         |  SELECT d1 AS src, d2 AS dst FROM pairs
         |  UNION ALL SELECT d2, d1 FROM pairs),
         |k0 AS (SELECT DISTINCT src AS doc_id, CAST(1000 AS BIGINT) AS x FROM edges),
         |${(1 to KatzRounds).map(katzRoundSql).mkString(",\n")},
         |deg AS (SELECT dst AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
         |        FROM edges GROUP BY dst)
         |SELECT k.doc_id, k.x AS katz_milli, deg.degree
         |FROM k$KatzRounds k JOIN deg ON k.doc_id = deg.doc_id
         |ORDER BY k.x DESC, k.doc_id ASC LIMIT 20""".stripMargin,

    // component labels as a recursive closure (the dedup_cluster_reps
    // oracle), re-aggregated into the size histogram
    "graph_component_census" ->
      s"""WITH RECURSIVE ${DedupQueries.pairsCte},
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2, d1 FROM pairs),
         |reach(doc_id, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.doc_id = e.dst),
         |final AS (SELECT doc_id, MIN(lab) AS lab FROM reach GROUP BY doc_id),
         |comps AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS comp_size
         |          FROM final GROUP BY lab),
         |tot AS (SELECT CAST(SUM(comp_size) AS BIGINT) AS n_docs FROM comps)
         |SELECT comp_size, CAST(COUNT(*) AS BIGINT) AS n_components,
         |  comp_size * CAST(COUNT(*) AS BIGINT) AS docs_in_size,
         |  (10000 * comp_size * CAST(COUNT(*) AS BIGINT)) // n_docs AS docs_share_bp
         |FROM comps CROSS JOIN tot
         |GROUP BY comp_size, n_docs
         |ORDER BY comp_size""".stripMargin
  )
}
