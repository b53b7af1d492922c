package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions._

/** Similarity search over `embeddings.embedding` (array<float>, 64-dim).
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
  * variant is the 100 TB scale path (candidates from a sign-bucket
  * equi-join instead of a query×corpus cross product). Both are pure
  * Catalyst higher-order expressions — no UDFs, no collect.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val N_QUERIES = 5

  private val queriesBase: Map[String, Q] = Map(
    // Brute-force exact top-k: broadcast the small query set against the
    // corpus (at 100 TB: corpus stays partitioned, queries broadcast;
    // per-partition top-k then global top-k via the window).
    "sim_knn_brute" -> ((s, d) => {
      import s.implicits._
      // corpus lands as one row group → spread the scoring across cores
      val emb = embeddings(s, d).repartition(s.sparkContext.defaultParallelism)
      val queriesDf = embeddings(s, d).filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      val scored = emb.join(broadcast(queriesDf), $"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id",
          cosineSimilarity($"q_emb", $"embedding").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"cosine")
        .orderBy($"q_id", $"rank")
    }),

    // Embedding near-duplicate pairs above a cosine threshold; candidate
    // pruning by same-label bucket keeps it off the full cross join
    // (label works as a coarse IVF cell here).
    "sim_neardup_pairs" -> ((s, d) => {
      import s.implicits._
      val emb = embeddings(s, d).select($"vec_id", $"label", $"embedding")
      emb.as("a").join(emb.as("b"),
        $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
          cosineSimilarity($"a.embedding", $"b.embedding").as("cosine"))
        .filter($"cosine" > 0.35)
        .orderBy($"v1", $"v2")
    }),

    // ANN via multi-table random-hyperplane LSH: L=4 tables × 8 sign
    // bits; a corpus vector is a candidate if it collides with the query
    // in ANY table (classic recall amplification). Hyperplane weights
    // derive deterministically from xxhash64(table, plane, dim) — no
    // driver-side randomness, reproducible across executors. At 100 TB
    // the (table, bucket) equi-join replaces the query×corpus product.
    // No SQL oracle (approximate + hash-derived planes) → rows-only check.
    "sim_knn_lsh" -> ((s, d) => {
      import s.implicits._
      val tables = 4
      val planes = 8
      // bucket(t) = 8 sign bits of the projections onto table t's planes
      def bucket(emb: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
        aggregate(
          sequence(lit(0), lit(planes - 1)),
          lit(0L),
          (acc, b) => acc.bitwiseOR(
            when(
              aggregate(
                zip_with(
                  emb,
                  transform(sequence(lit(0), lit(63)),
                    i => (pmod(xxhash64(t, b, i), lit(1000L)).cast("double") / 1000.0 - 0.5)),
                  (x, w) => x.cast("double") * w),
                lit(0.0), (a2, v) => a2 + v) > 0.0,
              call_function("shiftleft", lit(1L), b)).otherwise(0L)))
      def withBuckets(df: DataFrame) = df
        .select(col("*"), posexplode(transform(sequence(lit(0), lit(tables - 1)),
          t => bucket(col("embedding"), t))).as(Seq("tbl", "bucket")))
      val emb = withBuckets(embeddings(s, d).select($"vec_id", $"embedding"))
      val queriesDf = withBuckets(
        embeddings(s, d).filter($"vec_id" < N_QUERIES)
          .select($"vec_id".as("q_id"), $"embedding"))
        .select($"q_id", $"embedding".as("q_emb"), $"tbl", $"bucket")
      val cand = emb.join(broadcast(queriesDf), Seq("tbl", "bucket"))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", $"q_emb", $"embedding")
        .dropDuplicates("q_id", "vec_id")
      val scored = cand.select($"q_id", $"vec_id",
        cosineSimilarity($"q_emb", $"embedding").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"cosine")
        .orderBy($"q_id", $"rank")
    })
  )

  private val queriesMore: Map[String, Q] = Map(
    // IVF-style ANN: spherical k-means centroids form the inverted-file
    // cells; every vector is assigned to its nearest centroid, and a
    // query probes only its 2 nearest cells. At 100 TB the corpus is
    // partitioned by cell id, so a probe touches 2/16 of the data
    // instead of all of it. The quantizer is trained here with
    // DataFrame-native Lloyd iterations — assignment is a Catalyst
    // expression over the corpus, the centroid update is one
    // groupBy(cell, dim) mean, and the model (16×64 floats) rides the
    // driver→literal path exactly as it would ride a broadcast on a
    // cluster. (Spark ML's KMeans fits too, but its RDD conversion and
    // per-iteration job fan-out cost ~5 s of fixed overhead on a model
    // this small.) Approximate → rows-only driver check.
    "sim_knn_ivf" -> ((s, d) => {
      import s.implicits._
      val kCells = 16
      val emb = embeddings(s, d).select($"vec_id", $"embedding").cache()
      // deterministic seeds: the kCells vectors with smallest hashed id
      var model: Seq[(Int, Seq[Float])] = emb
        .orderBy(xxhash64($"vec_id"), $"vec_id").limit(kCells)
        .select($"embedding").as[Seq[Float]].collect().toSeq.zipWithIndex
        .map { case (c, i) => (i, c) }
      // nearest-centroid id for a vector, against the current model —
      // an explicit 16-wide array of codegen'd cosine calls (a HOF
      // lambda would evaluate interpreted, and a custom expression
      // under a lambda trips attribute resolution)
      def cellOf(v: org.apache.spark.sql.Column, m: Seq[(Int, Seq[Float])]) = {
        val sims = array(m.map { case (_, c) => cosineSimilarity(v, typedlit(c)) }: _*)
        (array_position(sims, array_max(sims)) - 1).cast("int")
      }
      for (_ <- 1 to 2) { // Lloyd: assign (distributed) → mean (grouped)
        val means = emb
          .select(cellOf($"embedding", model).as("cell"),
            posexplode($"embedding").as(Seq("dim", "x")))
          .groupBy($"cell", $"dim").agg(avg($"x").as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cell, rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat).toSeq)
          }
        model = model.map { case (i, old) => (i, means.getOrElse(i, old)) }
      }
      val assigned = emb.withColumn("cell", cellOf($"embedding", model))
      // query → its 2 nearest cells, via cosine against centroid vectors
      val centroids = model.toDF("cell", "centroid")
      val queriesDf = assigned.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
      val probes = queriesDf.crossJoin(broadcast(centroids))
        .select($"q_id", $"q_emb", $"cell",
          cosineSimilarity($"q_emb", $"centroid").as("csim"))
      val w0 = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"csim".desc, $"cell".asc)
      val probeCells = probes.withColumn("pr", row_number().over(w0))
        .filter($"pr" <= 2).select($"q_id", $"q_emb", $"cell")
      val scored = assigned.join(broadcast(probeCells), Seq("cell"))
        .filter($"vec_id" =!= $"q_id")
        .select($"q_id", $"vec_id", cosineSimilarity($"q_emb", $"embedding").as("cosine"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"vec_id", $"cosine")
        .orderBy($"q_id", $"rank")
    })
  )

  val queries: Map[String, Q] = queriesBase ++ queriesMore

  // Exact-arithmetic DuckDB twins: double-cast per element, sequential
  // list_sum fold — same bits as the Spark HOF fold.
  private val dot =
    "list_sum(list_transform(range(1, len(%s)+1), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"
  private def cos(a: String, b: String) =
    s"(${dot.format(a, a, b)} / (sqrt(${dot.format(a, a, a)}) * sqrt(${dot.format(b, b, b)})))"

  val oracles: Map[String, String] = Map(
    "sim_knn_brute" ->
      s"""SELECT q_id, rank, vec_id, cosine FROM (
         | SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |  ${cos("q.embedding", "e.embedding")} AS cosine,
         |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |    ORDER BY ${cos("q.embedding", "e.embedding")} DESC, e.vec_id ASC) AS rank
         | FROM embeddings q JOIN embeddings e ON q.vec_id < $N_QUERIES AND e.vec_id != q.vec_id) t
         |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin,

    "sim_neardup_pairs" ->
      s"""SELECT a.vec_id AS v1, b.vec_id AS v2,
         | ${cos("a.embedding", "b.embedding")} AS cosine
         |FROM embeddings a JOIN embeddings b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cos("a.embedding", "b.embedding")} > 0.35
         |ORDER BY v1, v2""".stripMargin
  )
}
