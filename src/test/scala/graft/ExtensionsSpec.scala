package graft

/** The extension-registered SQL functions must resolve in a session
  * carrying spark.sql.extensions=graft.GraftExtensions (the cluster
  * deployment path; the shared test session sets exactly that). */
class ExtensionsSpec extends SparkSuite {

  test("kernels are callable from SQL via SparkSessionExtensions") {
    val cos = spark.sql(
      "SELECT cosine_similarity(CAST(array(1.0, 0.0) AS array<float>), CAST(array(1.0, 0.0) AS array<float>)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val sim = spark.sql("SELECT simhash64(array('a','b','a')) AS s").collect().head.getLong(0)
    val sim2 = spark.sql("SELECT simhash64(array('a','b','a')) AS s").collect().head.getLong(0)
    assert(sim === sim2)

    val mh = spark.sql("SELECT size(minhash_signature(array('x y z','y z w'))) AS n")
      .collect().head.getInt(0)
    assert(mh === 64)
  }

  test("optimizer fuses array_distinct(ngrams(t,3)) into the Shingles3 kernel") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.GraftExpressions.{ngrams, shingles3}
    import graft.functions.TextFunctions.tokens
    // parquet-backed input — a local Seq would be constant-folded into
    // a LocalRelation before the plan can be inspected
    val df = Tables.documents(spark, sf).limit(64)
      .select(tokens($"text").as("tk"))
    val composed = df.select(array_distinct(ngrams($"tk", 3)).as("sh"))
    // the injected rule must rewrite the composed form to the kernel
    assert(composed.queryExecution.optimizedPlan.toString.contains("shingles3"),
      s"fusion did not fire:\n${composed.queryExecution.optimizedPlan}")
    val a = composed.collect().map(_.getSeq[String](0))
    val b = df.select(shingles3($"tk").as("sh")).collect().map(_.getSeq[String](0))
    assert(a.toSeq === b.toSeq)
    // redundant distinct over the kernel is dropped too
    val red = df.select(array_distinct(shingles3($"tk")).as("sh"))
    assert(!red.queryExecution.optimizedPlan.toString.contains("array_distinct"))
  }

  test("optimizer bounds thresholded levenshtein predicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // parquet-backed, so the filter survives to the optimized plan
    val df = Tables.part(spark, sf).limit(64)
      .select($"p_partkey", $"p_name")
    val j = df.as("a").join(df.as("b"), $"a.p_partkey" < $"b.p_partkey")
      .filter(levenshtein($"a.p_name", $"b.p_name") <= 2)
    val opt = j.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(2)) >= 0"),
      s"LevenshteinBounding did not rewrite the predicate:\n$opt")
    // rewritten predicate must select exactly the pairs the unbounded
    // form selects (bounded returns -1 above threshold, never a wrong hit)
    val n = j.count()
    val nRef = df.as("a").join(df.as("b"), $"a.p_partkey" < $"b.p_partkey")
      .filter(expr("levenshtein(a.p_name, b.p_name, 2) >= 0")).count()
    assert(n === nRef)
    // the reversed-literal strict phrasing (k > lev ⇔ lev <= k-1)
    // must rewrite too — and to the same k-1 bound
    val jRev = df.as("a").join(df.as("b"), $"a.p_partkey" < $"b.p_partkey")
      .filter(lit(3) > levenshtein($"a.p_name", $"b.p_name"))
    val optRev = jRev.queryExecution.optimizedPlan.toString
    assert(optRev.contains("Some(2)) >= 0"),
      s"LevenshteinBounding did not rewrite the reversed strict predicate:\n$optRev")
    assert(jRev.count() === n)
  }

  test("q93_fuzzy_pairs' optimized plan has no unbounded levenshtein") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    val q = graft.operators.RelationalQueries5.queries("q93_fuzzy_pairs")(spark, sf)
    val unbounded = q.queryExecution.optimizedPlan.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.isEmpty => l
      })
    }.flatten
    assert(unbounded.isEmpty,
      s"unbounded Levenshtein survives in q93's plan: $unbounded")
    // predicate pushdown substitutes the alias below the projection, so
    // the optimized plan carries two BOUNDED nodes: one in the Filter
    // (prunes per candidate pair, bails on length mismatch) and one in
    // the Project (computes the output value for survivors only) — the
    // shape you want; what must never appear is the unbounded form.
    val bounded = q.queryExecution.optimizedPlan.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case l: Levenshtein if l.threshold.nonEmpty => l
      })
    }.flatten
    assert(bounded.nonEmpty && bounded.size <= 2,
      s"expected 1-2 bounded Levenshtein nodes in q93's plan, got ${bounded.size}")
  }

  test("codegen'd cosine matches the interpreted eval path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.cosineSimilarity
    val df = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding")
    val viaExpr = df.as("a").crossJoin(df.as("b"))
      .select(cosineSimilarity($"a.embedding", $"b.embedding").as("c"))
      .agg(sum($"c")).collect().head.getDouble(0)
    // HOF formulation (interpreted) — same fold order, must agree exactly
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val viaHof = df.as("a").crossJoin(df.as("b"))
      .select((dot($"a.embedding", $"b.embedding") /
        (sqrt(dot($"a.embedding", $"a.embedding")) * sqrt(dot($"b.embedding", $"b.embedding")))).as("c"))
      .agg(sum($"c")).collect().head.getDouble(0)
    assert(viaExpr === viaHof)
  }
}
