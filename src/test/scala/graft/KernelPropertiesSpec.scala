package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Randomized algebraic properties of the native kernels (seeded — the
  * 64 cases are the same every run). These pin the MATH the dedup and
  * similarity operators rely on, independent of any corpus:
  * the one-hash MinHash union law is what makes signatures mergeable in
  * partial aggregation, and permutation invariance is what makes
  * SimHash stable under nondeterministic row order. */
class KernelPropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu")
  private def doc(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("minhash(A ∪ B) = elementwise min(minhash A, minhash B) — merge law") {
    val cases = Seq.fill(64)((doc(3 + rnd.nextInt(30)), doc(3 + rnd.nextInt(30))))
    val rows = cases.toDF("t1", "t2")
      .select(shingles3(tokens($"t1")).as("sa"), shingles3(tokens($"t2")).as("sb"))
      .filter(size($"sa") > 0 && size($"sb") > 0)
      .select(
        minhashSignature(array_union($"sa", $"sb"), 64).as("sig_union"),
        zip_with(minhashSignature($"sa", 64), minhashSignature($"sb", 64),
          (x, y) => least(x, y)).as("min_pair"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("bounded levenshtein agrees with unbounded at every threshold (rule soundness)") {
    // the LevenshteinBounding rewrite is sound iff
    // (lev(a,b) <= k) <=> (lev(a,b,k) >= 0) for all a, b, k >= 0
    val cases = Seq.fill(64)((doc(1 + rnd.nextInt(6)), doc(1 + rnd.nextInt(6))))
    (0 to 7).foreach { k =>
      val rows = cases.toDF("a", "b")
        .select(
          (levenshtein($"a", $"b") <= k).as("unbounded"),
          (levenshtein($"a", $"b", k) >= 0).as("bounded"))
        .collect()
      rows.foreach { r => assert(r.getBoolean(0) === r.getBoolean(1), s"k=$k") }
    }
  }

  test("ngrams matches the HOF formulation and counts every occurrence") {
    import graft.functions.GraftExpressions.ngrams
    val cases = Seq.fill(64)(doc(1 + rnd.nextInt(40)))
    val rows = cases.toDF("t")
      .select(tokens($"t").as("tk"))
      .select($"tk",
        ngrams($"tk", 8).as("fast"),
        // reference formulation: transform over positions (kept as the
        // slow spec — the kernel exists because this is interpreted)
        when(size($"tk") >= 8,
          expr("transform(sequence(0, size(tk) - 8), i -> concat_ws(' ', slice(tk, i + 1, 8)))"))
          .otherwise(array().cast("array<string>")).as("slow"))
      .collect()
    rows.foreach { r =>
      val tk = r.getSeq[String](0)
      val fast = r.getSeq[String](1)
      assert(fast === r.getSeq[String](2))
      assert(fast.size === math.max(0, tk.size - 7))
    }
  }

  test("simhash is invariant under token permutation") {
    val cases = Seq.fill(64)(doc(4 + rnd.nextInt(40))).map { t =>
      val toksArr = t.split(" ")
      (t, rnd.shuffle(toksArr.toSeq).mkString(" "))
    }
    val rows = cases.toDF("t1", "t2")
      .select(simhash64(tokens($"t1")).as("s1"), simhash64(tokens($"t2")).as("s2"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("cosine is symmetric, bounded, and 1 on itself") {
    val cases = Seq.fill(64)(
      (Seq.fill(16)(rnd.nextFloat() - 0.3f), Seq.fill(16)(rnd.nextFloat() - 0.3f)))
    val rows = cases.toDF("a", "b")
      .select(
        cosineSimilarity($"a", $"b").as("ab"),
        cosineSimilarity($"b", $"a").as("ba"),
        cosineSimilarity($"a", $"a").as("aa"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // bitwise symmetric
      assert(math.abs(r.getDouble(0)) <= 1.0 + 1e-9)
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
  }

  test("jaccard(A,A)=1 and jaccard ∈ [0,1]") {
    val cases = Seq.fill(64)((doc(3 + rnd.nextInt(30)), doc(3 + rnd.nextInt(30))))
    val rows = cases.toDF("t1", "t2")
      .select(shingles3(tokens($"t1")).as("sa"), shingles3(tokens($"t2")).as("sb"))
      .filter(size($"sa") > 0 && size($"sb") > 0)
      .select(jaccard($"sa", $"sa").as("jaa"), jaccard($"sa", $"sb").as("jab"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }
}
