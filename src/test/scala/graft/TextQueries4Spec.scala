package graft

import graft.operators.TextQueries4

/** Semantic invariants for the round-11 text-curation batch. */
class TextQueries4Spec extends SparkSuite {

  test("text_rake_keywords: phrases are stopword-free, ≤4 tokens, score-descending") {
    val rows = TextQueries4.queries("text_rake_keywords")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    rows.foreach { r =>
      val phrase = r.getAs[String]("phrase").split(" ")
      assert(phrase.length === r.getAs[Long]("n_words"))
      assert(phrase.length <= 4)
      assert(!phrase.exists(stop), s"stopword inside phrase: ${phrase.mkString(" ")}")
    }
    val scores = rows.map(_.getAs[Long]("score_milli"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("text_gopher_rules: per-rule passes never exceed doc counts; pass_all is the floor") {
    val rows = TextQueries4.queries("text_gopher_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val passes = Seq("pass_len", "pass_word_len", "pass_max_word",
        "pass_alpha", "pass_stopwords", "pass_repetition").map(r.getAs[Long](_))
      passes.foreach(p => assert(p >= 0 && p <= n))
      assert(r.getAs[Long]("pass_all") <= passes.min,
        "conjunction can't beat its weakest rule")
      assert(r.getAs[Long]("pass_all_bp") <= 10000)
    }
  }

  test("text_chi2_keywords: scores non-negative-ish, descending, margins sane") {
    val rows = TextQueries4.queries("text_chi2_keywords")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("chi2_milli"))
    assert(scores.sameElements(scores.sortBy(-_)))
    rows.foreach { r =>
      // χ² ≥ 0 up to the per-cell milli flooring (≤1 milli per lang cell)
      assert(r.getAs[Long]("chi2_milli") >= -5)
      assert(r.getAs[Long]("n_langs_seen") >= 1 && r.getAs[Long]("n_langs_seen") <= 5)
      assert(r.getAs[Long]("n_t") > 0)
    }
  }

  test("pipe_l_diversity: class and row totals are conserved across the l histogram") {
    val rows = TextQueries4.queries("pipe_l_diversity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val minL = rows.map(_.getAs[Long]("min_l")).distinct
    assert(minL.length === 1 && minL.head === rows.map(_.getAs[Long]("l")).min)
    val atRisk = rows.map(_.getAs[Long]("rows_at_risk")).distinct
    assert(atRisk.length === 1)
    val l1rows = rows.filter(_.getAs[Long]("l") === 1).map(_.getAs[Long]("n_rows")).sum
    assert(atRisk.head === l1rows, "rows_at_risk must equal the l=1 class mass")
    rows.foreach(r => assert(r.getAs[Long]("l") >= 1 && r.getAs[Long]("l") <= 3))
  }
}
