package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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
    e.injectFunction((
      FunctionIdentifier("token_chunk_slices"),
      info("token_chunk_slices",
        "token_chunk_slices(start, n, budget) - UDTF: per-chunk (chunk_id, slice_start, slice_len) rows"),
      (es: Seq[Expression]) => TokenChunkSlices(es.head, es(1), es(2))))
  }
}
