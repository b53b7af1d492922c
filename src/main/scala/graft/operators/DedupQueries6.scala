package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-17 dedup additions — CROSS-DOCUMENT EXACT-SUBSTRING DEDUP
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"): find every token span of length ≥ L that appears
  * verbatim in MORE THAN ONE document, mapped per document as maximal
  * [start, end) intervals for surgical removal. This completes the
  * dedup family's Lee-et-al coverage: `dedup_exact`/`_norm` remove
  * whole-document copies, `dedup_minhash_lsh` near-copies,
  * `dedup_repeated_ngrams` is the corpus-level census of repeated
  * grams, `text_boilerplate_phrases` the boilerplate census — this op
  * is the missing WITHIN-document surgical map (which tokens of which
  * doc to cut, not just which grams are frequent).
  *
  * Shape — shingle-anchored, never suffix-array-global:
  *
  *   1. ANCHORS — every L-token gram of every doc, position-ordered
  *      (the native [[graft.functions.NGrams]] kernel), keyed by the
  *      portable md5-derived 60-bit hash so the DuckDB oracle replays
  *      the key byte-identically. The gram STRING is dropped before
  *      any shuffle — only (doc_id, pos, 8-byte key) moves.
  *   2. CROSS-DOC KEYS — group anchors by key, keep keys carried by
  *      ≥ 2 distinct docs (map-side partial aggregation; the count
  *      never materializes per-doc lists).
  *   3. DUPLICATED ANCHOR POSITIONS — one keyed equi-join of the
  *      anchor stream against the duplicated-key set.
  *   4. MAXIMAL SPANS — per doc, merge overlapping-or-adjacent anchor
  *      windows [pos, pos+L) into islands (gaps-and-islands: break
  *      when pos − lag(pos) > L; anchor windows are fixed-length so
  *      the island's running end is the last anchor + L, making the
  *      lag test exact). Every position inside an emitted span is
  *      covered by ≥ 1 cross-doc-duplicated anchor by construction.
  *
  * A span of J > L duplicated tokens yields J − L + 1 consecutive
  * anchors that merge back into one [start, start+J) interval —
  * exactly the Lee et al. span semantics, built from grouped keyed
  * joins instead of their suffix array (which needs a global sort of
  * the token stream; the anchor formulation is the same fixpoint for
  * spans ≥ L and is embarrassingly key-parallel).
  *
  * Scale at 100 TB: anchors are ~|tokens| rows of 20 bytes; both the
  * key census and the anchor join shuffle ON THE 8-BYTE KEY (no
  * strings move); the island windows partition per doc (bounded by
  * document length). Nothing is quadratic in corpus size and nothing
  * sorts globally. Hot keys (boilerplate shared by millions of docs)
  * cap at one count row in stage 2 and fan back out only to the docs
  * that actually carry them.
  */
object DedupQueries6 {
  type Q = (SparkSession, String) => DataFrame

  /** Minimum duplicated span length in tokens (Lee et al. use 50 BPE
    * tokens at web scale; 8 whitespace tokens matches this corpus's
    * short synthetic docs and the dedup_repeated_ngrams gram width). */
  private val L = 8

  /** (doc_id, pos) of every anchor whose L-gram occurs in ≥2 distinct
    * docs — memoized per (session, dir): both queries below read one
    * build (the house substrate discipline; localCheckpoint so the
    * second query doesn't re-run the census join). */
  private val anchorsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def dupAnchors(s: SparkSession, d: String): DataFrame =
    anchorsMemo.computeIfAbsent((s, d), _ => dupAnchorsRun(s, d))
  private def dupAnchorsRun(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grams = documents(s, d)
      .select($"doc_id",
        posexplode(graft.functions.GraftExpressions.ngrams(
          graft.functions.TextFunctions.tokens($"text"), L)))
      .select($"doc_id", $"pos".cast("long").as("pos"),
        // portable 60-bit key: DuckDB replays it as
        // ('0x' || substring(md5(gram), 1, 15))::BIGINT
        conv(substring(md5($"col".cast("binary")), 1, 15), 16, 10)
          .cast("long").as("k"))
    val dup = grams.groupBy($"k")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" >= 2)
      .select($"k")
    grams.join(dup, Seq("k")).select($"doc_id", $"pos").localCheckpoint()
  }

  val queries: Map[String, Q] = Map(
    // Per-doc maximal duplicated spans: the surgical removal map.
    "dedup_substring_spans" -> ((s, d) => {
      import s.implicits._
      val wLag = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      dupAnchors(s, d)
        .withColumn("prev", lag($"pos", 1).over(wLag))
        .withColumn("brk",
          when($"prev".isNull || $"pos" - $"prev" > L, 1L).otherwise(0L))
        .withColumn("island", sum($"brk").over(wCum))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("span_start"),
          (max($"pos") + L).as("span_end"),
          count(lit(1)).as("n_anchors"))
        .select($"doc_id", $"span_start", $"span_end",
          ($"span_end" - $"span_start").as("span_tokens"), $"n_anchors")
        .orderBy($"doc_id", $"span_start")
    }),

    // Per-doc removal census: how much of each affected doc the
    // surgical cut removes (the number a curation run reports before
    // committing the cut). kept = n_tokens − dup; spans never overlap
    // after the island merge, so the sum is exact.
    "dedup_substring_removal" -> ((s, d) => {
      import s.implicits._
      val wLag = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val spans = dupAnchors(s, d)
        .withColumn("prev", lag($"pos", 1).over(wLag))
        .withColumn("brk",
          when($"prev".isNull || $"pos" - $"prev" > L, 1L).otherwise(0L))
        .withColumn("island", sum($"brk").over(wCum))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("ss"), (max($"pos") + L).as("se"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_spans"), sum($"se" - $"ss").as("dup_tokens"))
      documents(s, d)
        .select($"doc_id",
          size(graft.functions.TextFunctions.tokens($"text"))
            .cast("long").as("n_tokens"))
        .join(spans, Seq("doc_id"))
        .select($"doc_id", $"n_tokens", $"n_spans", $"dup_tokens",
          ($"n_tokens" - $"dup_tokens").as("kept_tokens"))
        .orderBy($"doc_id")
    }),

    // PER-SOURCE DUPLICATION RATIO — the Lee et al. headline number
    // per ingestion source (what fraction of a source's token mass
    // sits inside cross-doc duplicated spans): the decision table for
    // where the substring cut pays. Same substrate, one extra
    // source-keyed rollup; docs with no duplicated span contribute
    // only token mass (left join, zero-fill).
    "dedup_substring_ratio" -> ((s, d) => {
      import s.implicits._
      val wLag = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val perDoc = dupAnchors(s, d)
        .withColumn("prev", lag($"pos", 1).over(wLag))
        .withColumn("brk",
          when($"prev".isNull || $"pos" - $"prev" > L, 1L).otherwise(0L))
        .withColumn("island", sum($"brk").over(wCum))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("ss"), (max($"pos") + L).as("se"))
        .groupBy($"doc_id")
        .agg(sum($"se" - $"ss").as("dup_tokens"))
      documents(s, d)
        .select($"source", $"doc_id",
          size(graft.functions.TextFunctions.tokens($"text"))
            .cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"dup_tokens".isNotNull, 1L).otherwise(0L)).as("n_affected"),
          sum($"n_tokens").as("total_tokens"),
          sum(coalesce($"dup_tokens", lit(0L))).as("dup_tokens"))
        .selectExpr("source", "n_docs", "n_affected", "total_tokens",
          "dup_tokens", "(10000 * dup_tokens) DIV total_tokens AS dup_bp")
        .orderBy($"source")
    })
  )

  val oracles: Map[String, String] = Map(
    "dedup_substring_spans" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        | SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        | FROM toks WHERE len(t) >= 8),
        |g AS (
        | SELECT doc_id, i - 1 AS pos,
        |  ('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS k
        | FROM pos),
        |dup AS (SELECT k FROM g GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2),
        |a AS (SELECT doc_id, pos FROM g JOIN dup USING (k)),
        |b AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |        OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
        | FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |c AS (
        | SELECT doc_id, pos, SUM(brk) OVER (
        |   PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM b)
        |SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end,
        |  MAX(pos) + 8 - MIN(pos) AS span_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS n_anchors
        |FROM c GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // Same CTE chain as the removal oracle, rolled up per source with
    // a zero-fill left join for span-free docs.
    "dedup_substring_ratio" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        | SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        | FROM toks WHERE len(t) >= 8),
        |g AS (
        | SELECT doc_id, i - 1 AS pos,
        |  ('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS k
        | FROM pos),
        |dup AS (SELECT k FROM g GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2),
        |a AS (SELECT doc_id, pos FROM g JOIN dup USING (k)),
        |b AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |        OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
        | FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |c AS (
        | SELECT doc_id, pos, SUM(brk) OVER (
        |   PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM b),
        |sp AS (
        | SELECT doc_id, MIN(pos) AS ss, MAX(pos) + 8 AS se
        | FROM c GROUP BY doc_id, island),
        |per AS (
        | SELECT doc_id, CAST(SUM(se - ss) AS BIGINT) AS dup_tokens
        | FROM sp GROUP BY doc_id),
        |dt AS (SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |         AS n_tokens FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN p.dup_tokens IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_affected,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(SUM(COALESCE(p.dup_tokens, 0)) AS BIGINT) AS dup_tokens,
        |  (10000 * CAST(SUM(COALESCE(p.dup_tokens, 0)) AS BIGINT))
        |    // CAST(SUM(n_tokens) AS BIGINT) AS dup_bp
        |FROM dt LEFT JOIN per p USING (doc_id)
        |GROUP BY source ORDER BY source""".stripMargin,

    "dedup_substring_removal" ->
      """WITH toks AS (
        | SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |pos AS (
        | SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        | FROM toks WHERE len(t) >= 8),
        |g AS (
        | SELECT doc_id, i - 1 AS pos,
        |  ('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15))::BIGINT AS k
        | FROM pos),
        |dup AS (SELECT k FROM g GROUP BY k HAVING COUNT(DISTINCT doc_id) >= 2),
        |a AS (SELECT doc_id, pos FROM g JOIN dup USING (k)),
        |b AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |        OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
        | FROM a WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |c AS (
        | SELECT doc_id, pos, SUM(brk) OVER (
        |   PARTITION BY doc_id ORDER BY pos
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM b),
        |sp AS (
        | SELECT doc_id, MIN(pos) AS ss, MAX(pos) + 8 AS se
        | FROM c GROUP BY doc_id, island),
        |per AS (
        | SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
        |  CAST(SUM(se - ss) AS BIGINT) AS dup_tokens
        | FROM sp GROUP BY doc_id),
        |nt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks)
        |SELECT doc_id, n_tokens, n_spans, dup_tokens,
        |  n_tokens - dup_tokens AS kept_tokens
        |FROM nt JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin
  )
}
