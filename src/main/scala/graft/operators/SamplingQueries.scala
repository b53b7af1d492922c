package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Dataset-curation operators a training-data pipeline needs around the
  * cleaning/dedup stages: deterministic sampling, split assignment, and
  * token-budget packing.
  *
  * All sampling here is HASH sampling (md5 of the key against a hex
  * threshold), not RNG sampling: the same row always lands on the same
  * side regardless of cluster size, partitioning, or retries — which is
  * what makes 100 TB pipelines reproducible and incremental (a re-run
  * over late-arriving data samples consistently with the original run).
  * It is also exactly oracle-expressible, unlike `df.sample`'s
  * partition-seeded RNG.
  */
object SamplingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** First two hex chars of md5(key) — a uniform 0..255 bucket as text;
    * `bucket < 'xx'` selects a deterministic fraction. */
  private def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  val queries: Map[String, Q] = Map(
    // ~10% deterministic sample (26/256 of the md5 space).
    "samp_hash_sample" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .filter(hashBucket($"doc_id") < "1a")
        .select($"doc_id", $"lang", $"n_chars")
        .orderBy($"doc_id")
    }),

    // ~80/10/10 train/val/test split, stable under reprocessing; the
    // aggregate proves the split is exhaustive and disjoint.
    "samp_train_val_test" -> ((s, d) => {
      import s.implicits._
      val b = hashBucket($"doc_id")
      documents(s, d)
        .withColumn("split",
          when(b < "cc", "train").when(b < "e6", "val").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length($"text")).cast("long").as("n_chars"))
        .orderBy($"split")
    }),

    // Stratified hash sampling: per-language rates (downsample the
    // dominant stratum, keep the tail) — `sampleBy` semantics without
    // its RNG. The rate map would be a broadcast literal at any scale.
    "samp_stratified" -> ((s, d) => {
      import s.implicits._
      val threshold = when($"lang" === "en", "10").otherwise("40")
      documents(s, d)
        .filter(hashBucket($"doc_id") < threshold)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy($"lang")
    }),

    // Fixed-SIZE per-stratum sample: exactly k docs per language,
    // chosen by hash order — the deterministic replacement for
    // per-group reservoir sampling (same k, stable across runs and
    // cluster sizes; one window shuffle keyed by the stratum).
    "samp_topk_per_stratum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang")
        .orderBy(md5($"doc_id".cast("string").cast("binary")), $"doc_id")
      documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .select($"doc_id", $"lang", $"rn")
        .orderBy($"lang", $"rn")
    }),

    // Concat-and-chunk token packing (the LLM-pretraining layout:
    // documents concatenated in doc_id order, sliced every `budget`
    // tokens). The global token offset is a distributed two-pass prefix
    // sum — per-range-partition cumsum plus an exclusive prefix over
    // the ~32 partition totals collected to the driver — NOT a global
    // single-partition window, which would serialize 100 TB through
    // one task. Output: each doc's chunk assignment and how many
    // chunk boundaries it straddles.
    "pack_token_chunks" -> ((s, d) => {
      import s.implicits._
      import graft.functions.TextFunctions.tokens
      val budget = 2048.0
      val toks = documents(s, d)
        .select($"doc_id", size(tokens($"text")).cast("long").as("n_tokens"))
        .repartitionByRange(32, $"doc_id")
        .withColumn("pid", spark_partition_id())
        .cache()
      // pass 1: partition totals → exclusive prefix (driver-side; one
      // row per partition, ordered by the partition's doc_id range)
      val totals = toks.groupBy($"pid")
        .agg(sum($"n_tokens").as("t"), min($"doc_id").as("lo"))
        .collect().sortBy(_.getAs[Long]("lo"))
      var acc = 0L
      val offsets = totals.map { r =>
        val o = r.getAs[Int]("pid") -> acc; acc += r.getAs[Long]("t"); o
      }.toMap
      // pass 2: partition-local cumsum + the partition's global offset
      val w = Window.partitionBy($"pid").orderBy($"doc_id")
      toks
        .withColumn("start_offset",
          sum($"n_tokens").over(w) - $"n_tokens" + element_at(typedlit(offsets), $"pid"))
        .select($"doc_id", $"n_tokens", $"start_offset",
          floor($"start_offset" / budget).as("chunk_id"),
          (floor(($"start_offset" + greatest($"n_tokens", lit(1L)) - 1) / budget)
            - floor($"start_offset" / budget) + 1).as("n_chunks_spanned"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "samp_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
        |ORDER BY doc_id""".stripMargin,

    "samp_train_val_test" ->
      """SELECT split, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |FROM (SELECT text,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        | FROM documents)
        |GROUP BY split ORDER BY split""".stripMargin,

    "samp_stratified" ->
      """SELECT lang, COUNT(*) AS n_sampled FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |      < (CASE WHEN lang = 'en' THEN '10' ELSE '40' END)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "samp_topk_per_stratum" ->
      """SELECT doc_id, lang, rn FROM (
        | SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,

    "pack_token_chunks" ->
      """WITH t AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    - n_tokens AS BIGINT) AS start_offset
        | FROM t)
        |SELECT doc_id, n_tokens, start_offset,
        | CAST(floor(start_offset / 2048.0) AS BIGINT) AS chunk_id,
        | CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 2048.0)
        |      - floor(start_offset / 2048.0) + 1 AS BIGINT) AS n_chunks_spanned
        |FROM c ORDER BY doc_id""".stripMargin
  )
}
