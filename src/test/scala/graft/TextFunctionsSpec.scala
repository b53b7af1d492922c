package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Property-style tests for the text/dedup primitives. */
class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("shingle count is max(0, tokens-2) and shingles are distinct") {
    val df = Seq("a b c d e", "a b", "", "x y z", "a a a a").toDF("text")
      .select(size(tokens($"text")).as("n"), shingles3(tokens($"text")).as("sh"))
      .select($"n", size($"sh").as("k"), size(array_distinct($"sh")).as("kd"))
      .collect()
    df.foreach { r =>
      val (n, k, kd) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(k <= math.max(0, n - 2))
      assert(k === kd)
    }
  }

  test("jaccard is 1 for identical docs, in [0,1] for arbitrary pairs") {
    val df = Seq(("a b c d e f", "a b c d e f"), ("a b c x y z", "a b c q r s"))
      .toDF("t1", "t2")
      .select(jaccard(shingles3(tokens($"t1")), shingles3(tokens($"t2"))).as("j"))
      .as[Double].collect()
    assert(df(0) === 1.0)
    assert(df(1) >= 0.0 && df(1) <= 1.0)
  }

  test("minhash signature has k elements; identical docs have identical signatures") {
    val df = Seq("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over the lazy dog")
      .toDF("text")
      .select(minhashSignature(shingles3(tokens($"text")), 64).as("sig"))
      .collect()
    assert(df(0).getSeq[Long](0).length === 64)
    assert(df(0).getSeq[Long](0) === df(1).getSeq[Long](0))
  }

  test("portable hash is pinned to md5's first 15 hex chars (oracle contract)") {
    // The DuckDB oracles replay signatures via
    // ('0x' || substring(md5(x), 1, 15))::BIGINT — this test freezes
    // the Scala side to that exact value so an accidental hash change
    // breaks here before it breaks 4 oracle-gated queries.
    import graft.functions.PortableHashTestAccess
    assert(PortableHashTestAccess.md5hash60("hello") === 419982666956583591L)
    assert(PortableHashTestAccess.md5hash60("the cat sat") === 1104092474046240884L)
    assert(PortableHashTestAccess.md5hash60("") === 955282973525019424L)
  }

  test("simhash of identical token bags is identical; hamming(x,x)=0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "a b c e"))
      .toDF("t1", "t2")
      .select(bit_count(simhash64(tokens($"t1")).bitwiseXOR(simhash64(tokens($"t2")))).as("h"))
      .as[Int].collect()
    assert(df(0) === 0)
    assert(df(1) > 0)
  }

  test("normalize collapses case and whitespace") {
    val out = Seq("  Hello   WORLD  ").toDF("text")
      .select(normalize($"text")).as[String].collect().head
    assert(out === "hello world")
  }
}
