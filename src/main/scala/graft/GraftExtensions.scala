package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{CosineSimilarity, MinHashSignature, NGrams, SimHash64, TokenChunkSlices}

/** SparkSessionExtensions entry point: registers the native kernels as
  * SQL functions so any session built with
  * `.withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster — can call
  * them from plain SQL. The DataFrame API path (GraftExpressions) needs
  * no registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.ShingleFusion)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinBounding)
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(shingles) - 64-hash MinHash signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, 64)))
    e.injectFunction((
      FunctionIdentifier("ngrams"),
      info("ngrams", "ngrams(tokens, n) - all n-token grams in position order"),
      (es: Seq[Expression]) => {
        // arbitrary SQL reaches this builder: fail at analysis time
        // with a clear message, not an opaque internal exception
        require(es.length == 2,
          s"ngrams(tokens, n) takes exactly 2 arguments, got ${es.length}")
        val nExpr = es(1)
        require(nExpr.foldable,
          s"ngrams: n must be a literal, got ${nExpr.sql}")
        // integral types only — Number.intValue would silently truncate
        // 2.7 to 2 or 2^32+3 to 3
        val n: Long = nExpr.eval() match {
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
          case s: java.lang.Short => s.longValue()
          case b: java.lang.Byte => b.longValue()
          case other => throw new IllegalArgumentException(
            s"ngrams: n must be a non-null integral literal, got ${nExpr.sql} ($other)")
        }
        require(n >= 1 && n <= Int.MaxValue,
          s"ngrams: n must be in [1, ${Int.MaxValue}], got $n")
        NGrams(es.head, n.toInt)
      }))
    // Catalyst's runtime-filter bloom expressions, exposed as SQL
    // functions (Spark registers them only for internal use by
    // InjectRuntimeFilter). bloom_filter_agg(xxhash64(k), items, bits)
    // builds a binary sketch; bloom_might_contain(bf, xxhash64(k))
    // probes it — the explicit semi-join-reduction primitive for
    // shipping a compact filter to a 100 TB probe side.
    e.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(col), est_items, num_bits) - binary bloom filter over a LONG column"),
      (es: Seq[Expression]) => {
        require(es.length == 3,
          s"bloom_filter_agg(value, est_items, num_bits) takes exactly 3 arguments, got ${es.length}")
        new BloomFilterAggregate(es.head, es(1), es(2))
      }))
    e.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, xxhash64(col)) - probe a bloom_filter_agg sketch"),
      (es: Seq[Expression]) => {
        require(es.length == 2,
          s"bloom_might_contain(bloom, value) takes exactly 2 arguments, got ${es.length}")
        BloomFilterMightContain(es.head, es(1))
      }))
    e.injectFunction((
      FunctionIdentifier("token_chunk_slices"),
      info("token_chunk_slices",
        "token_chunk_slices(start, n, budget) - UDTF: per-chunk (chunk_id, slice_start, slice_len) rows"),
      (es: Seq[Expression]) => TokenChunkSlices(es.head, es(1), es(2))))
  }
}
