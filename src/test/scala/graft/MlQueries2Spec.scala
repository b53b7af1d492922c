package graft

import graft.operators.{MlQueries2, RelationalQueries12, GraphQueries2, SamplingQueries}

/** Semantic invariants for the round-11 model-evaluation batch —
  * properties the DuckDB hash gate can't see (it proves parity, not
  * meaning): split optimality, calibration bounds, conformal coverage,
  * HITS normalization, packing feasibility. */
class MlQueries2Spec extends SparkSuite {

  test("ml_decision_stump: exactly one best split, and it minimizes the reported gini") {
    val rows = MlQueries2.queries("ml_decision_stump")(spark, sf).collect()
    assert(rows.length > 1)
    val best = rows.filter(_.getAs[Boolean]("is_best"))
    assert(best.length === 1, "is_best must pick exactly one threshold")
    val ginis = rows.map(r => r.getAs[String]("gini").toDouble)
    assert(best.head.getAs[String]("gini").toDouble === ginis.min)
    // split sides always partition the corpus: nl + nr constant
    val ns = rows.map(r => r.getAs[Long]("n_left") + r.getAs[Long]("n_right")).distinct
    assert(ns.length === 1)
  }

  test("ml_calibration_ece: ECE is the n-weighted mean gap and sits inside [min gap, max gap]") {
    val rows = MlQueries2.queries("ml_calibration_ece")(spark, sf).collect()
    val gaps = rows.map(_.getAs[Long]("gap_milli"))
    val ece = rows.map(_.getAs[Long]("ece_milli")).distinct
    assert(ece.length === 1, "ECE is a single scalar repeated per bin")
    assert(ece.head >= 0 && ece.head <= gaps.max)
    rows.foreach { r =>
      assert(r.getAs[Long]("conf_milli") >= 0 && r.getAs[Long]("conf_milli") <= 1000)
      assert(r.getAs[Long]("acc_milli") >= 0 && r.getAs[Long]("acc_milli") <= 1000)
    }
  }

  test("ml_conformal_interval: held-out coverage is near the 90% target") {
    val rows = MlQueries2.queries("ml_conformal_interval")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nTest = rows.map(_.getAs[Long]("n_test")).sum
    val nCov = rows.map(_.getAs[Long]("n_covered")).sum
    val pooled = nCov * 10000 / nTest
    // split-conformal guarantee is marginal over the pooled test set;
    // per-segment rates can wobble on a small SF, the pooled rate can't
    assert(pooled >= 8500 && pooled <= 9700,
      s"pooled coverage $pooled bp should be near the 9000 bp target")
    assert(rows.map(_.getAs[Long]("q_hat_cents")).distinct.length === 1)
  }

  test("graph_hits: authority scores are positive, L1-bounded by the 1e6 normalizer, and sorted") {
    val rows = GraphQueries2.queries("graph_hits")(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)
    val scores = rows.map(_.getAs[Long]("auth_score"))
    assert(scores.forall(x => x > 0 && x <= 1000000L))
    assert(scores.sameElements(scores.sortBy(-_)), "top-20 must be score-descending")
  }

  test("pack_shelf_bins: every plan row is feasible and the plan never beats the lower bound") {
    val rows = SamplingQueries.queries("pack_shelf_bins")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shelf = r.getAs[Long]("shelf")
      val perBin = r.getAs[Long]("per_bin")
      if (shelf <= 256) assert(perBin * shelf <= 256, "a bin must hold per_bin docs of shelf size")
      assert(r.getAs[Long]("util_bp") <= 10000)
      assert(r.getAs[Long]("n_bins") > 0)
    }
    val totalBins = rows.map(_.getAs[Long]("total_bins")).distinct
    val lb = rows.map(_.getAs[Long]("lb_bins")).distinct
    assert(totalBins.length === 1 && lb.length === 1)
    assert(totalBins.head >= lb.head, "no packing beats the fractional lower bound")
  }

  test("ml_isolation_stumps: masses ascend, stay within [16, 16n], ids unique") {
    val rows = MlQueries2.queries("ml_isolation_stumps")(spark, sf).collect()
    assert(rows.length === 20)
    val masses = rows.map(_.getAs[Long]("isolation_mass"))
    assert(masses.sameElements(masses.sorted), "top-20 must be mass-ascending")
    // each of the 16 stumps contributes a side of size in [1, n]
    masses.foreach(m => assert(m >= 16))
    assert(rows.map(_.getAs[Long]("event_id")).distinct.length === 20)
  }

  test("graph_modularity: Q is the repeated scalar in [-1, 1] micro; intra mass bounded by degree mass") {
    val rows = GraphQueries2.queries("graph_modularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getAs[Long]("modularity_micro")).distinct
    assert(q.length === 1)
    assert(q.head >= -1000000L && q.head <= 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("e_intra") <= r.getAs[Long]("deg_c"),
        "intra-community directed edges can't exceed the community's degree mass")
    }
  }

  test("sim_ndcg_eval: nDCG in [0, 10000] bp, DCG never beats IDCG, topk hits bounded by n_rel... ") {
    val rows = MlQueries2.queries("sim_ndcg_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("ndcg_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("dcg_micro") <= r.getAs[Long]("idcg_micro"),
        "realized DCG can't exceed the ideal")
      assert(r.getAs[Long]("rel_in_topk") <= 10)
    }
  }

  test("ml_svm_gd: two subgradient steps beat the majority baseline and find the quantity axis") {
    val r = MlQueries2.queries("ml_svm_gd")(spark, sf).collect().head
    assert(r.getAs[Long]("acc_bp") > r.getAs[Long]("majority_bp") + 2000,
      "the separable concept must be learned, not memorized by the prior")
    assert(math.abs(r.getAs[Long]("w2_bp")) > math.abs(r.getAs[Long]("w1_bp")),
      "the informative feature (quantity) must dominate the noise feature")
    assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n"))
  }

  test("q191_capture_recapture: Chapman estimate bounded by the marginal captures") {
    val r = RelationalQueries12.queries("q191_capture_recapture")(spark, sf).collect().head
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("m"))
    assert(m <= math.min(n1, n2), "recaptures can't exceed either capture")
    val nHat = r.getAs[Long]("n_hat")
    assert(nHat >= math.max(n1, n2), "estimate at least as large as either sample")
    assert(r.getAs[Long]("true_n") >= math.max(n1, n2))
  }

  test("q192_twoway_anova: cell structure is the 5x5 factorial and Fs are non-negative") {
    val r = RelationalQueries12.queries("q192_twoway_anova")(spark, sf).collect().head
    assert(r.getAs[Long]("k_a") === 5 && r.getAs[Long]("k_b") === 5)
    assert(r.getAs[Long]("k_cells") === 25)
    Seq("f_seg_milli", "f_reg_milli", "f_inter_milli").foreach { c =>
      val v = r.getAs[Long](c)
      // SS terms floor-quantize at kilo-cents², so tiny negatives are possible noise
      assert(v >= -100, s"$c = $v")
    }
  }

  test("q193_paired_ttest / q194_mcnemar / pipe_simpson_diversity invariants") {
    val sf001 = sf
    val t = RelationalQueries12.queries("q193_paired_ttest")(spark, sf001).collect().head
    assert(t.getAs[Long]("n") > 0)
    if (!t.isNullAt(t.fieldIndex("t2_milli"))) assert(t.getAs[Long]("t2_milli") >= 0)

    val m = RelationalQueries12.queries("q194_mcnemar")(spark, sf001).collect().head
    assert(m.getAs[Long]("b") >= 0 && m.getAs[Long]("c") >= 0)
    if (!m.isNullAt(m.fieldIndex("chi2_milli"))) assert(m.getAs[Long]("chi2_milli") >= 0)

    val dv = RelationalQueries12.queries("pipe_simpson_diversity")(spark, sf001).collect()
    assert(dv.map(_.getAs[String]("dim")).sorted.sameElements(Array("lang", "source")))
    dv.foreach { r =>
      val gs = r.getAs[Long]("gini_simpson_bp")
      assert(gs >= 0 && gs < 10000)
      // effective k can never exceed the observed category count
      assert(r.getAs[Long]("effective_k_milli") <= r.getAs[Long]("k") * 1000)
    }
  }

  test("q195_p_chart / q196_cochran_q / samp_horvitz_thompson invariants") {
    val pc = RelationalQueries12.queries("q195_p_chart")(spark, sf).collect()
    assert(pc.nonEmpty)
    pc.foreach { r =>
      assert(r.getAs[Long]("n_ooc_hi") + r.getAs[Long]("n_ooc_lo") <= r.getAs[Long]("n_days"))
      val p = r.getAs[Long]("pbar_bp"); assert(p > 0 && p < 10000)
    }

    val cq = RelationalQueries12.queries("q196_cochran_q")(spark, sf).collect().head
    assert(cq.getAs[Long]("t") === cq.getAs[Long]("c95") + cq.getAs[Long]("c96") + cq.getAs[Long]("c97"))
    assert(cq.getAs[Long]("sum_r2") >= cq.getAs[Long]("t"), "Σr² ≥ Σr for 0/1 rows")
    if (!cq.isNullAt(cq.fieldIndex("q_milli"))) assert(cq.getAs[Long]("q_milli") >= 0)

    val ht = SamplingQueries.queries("samp_horvitz_thompson")(spark, sf).collect().head
    assert(ht.getAs[Long]("n_sample") > 0)
    // PPS + HT on a size-correlated target must land within 25% of truth
    assert(ht.getAs[Long]("err_bp") < 2500,
      s"HT estimate off by ${ht.getAs[Long]("err_bp")} bp")
  }

  test("q190_crosscorr_leadlag: 15 lags, one peak, r in [-1, 1]") {
    val rows = RelationalQueries12.queries("q190_crosscorr_leadlag")(spark, sf).collect()
    assert(rows.length === 15)
    assert(rows.count(_.getAs[Boolean]("is_peak")) === 1)
    rows.foreach { r =>
      val rv = r.getAs[String]("r").toDouble
      assert(rv >= -1.0 && rv <= 1.0)
    }
  }
}
