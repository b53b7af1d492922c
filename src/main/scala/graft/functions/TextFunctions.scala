package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data operators (dedup, quality,
  * language-ID). Everything here is built-in Catalyst expressions —
  * whole-stage-codegen friendly, no UDFs — and each has an exact DuckDB
  * twin documented next to the query that uses it.
  */
object TextFunctions {

  /** Whitespace tokens (single-space split — the corpus is space-joined). */
  def tokens(text: Column): Column = split(text, " ")

  /** Lowercase, collapse whitespace, trim — canonical form for
    * fingerprinting / normalized dedup.
    * DuckDB twin: trim(regexp_replace(lower(x), '\s+', ' ', 'g')). */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Distinct 3-token shingles as a native kernel (the HOF chain —
    * transform(sequence(...), concat_ws) + array_distinct — re-ran
    * interpreted lambdas per position).
    * DuckDB twin: list_distinct(list_transform(range(1, len(t)-1),
    *   i -> t[i]||' '||t[i+1]||' '||t[i+2])). */
  def shingles3(toks: Column): Column = GraftExpressions.shingles3(toks)

  /** |A ∩ B| / |A ∪ B| over two distinct-element arrays, as double. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    (inter * lit(1.0)) / (size(a) + size(b) - inter)
  }

  /** MinHash signature: k-member one-hash family over the doc's
    * shingles, as a native Catalyst expression (the HOF formulation —
    * transform(seq(k), i -> array_min(transform(shingles, hash))) — is
    * interpreted per element and was ~15× slower at sf0.1). Empty
    * shingle set → null (dropped by callers). */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftExpressions.minhash_signature(shingles, k)

  /** LSH band keys: hash `rowsPerBand`-sized slices of the signature.
    * Docs sharing any band key become near-dup candidates. */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))),
        b.cast("string")))

  /** 64-bit SimHash over tokens: per bit position, sum +1/-1 votes from
    * each token's xxhash64; the sign vector packed into one BIGINT.
    * Hamming distance between two simhashes = bit_count(a XOR b).
    * Native expression — the nested-HOF formulation recomputed the
    * token hash 64× per token and cost 130 s at sf0.1 vs ~1 s now. */
  def simhash64(toks: Column): Column = GraftExpressions.simhash64(toks)
}
