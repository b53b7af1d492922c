package graft

/** Behavioral invariants of the round-14 operators — properties the
  * hash gate can't express (it pins values, not the math that makes
  * them correct). */
class Round14Spec extends SparkSuite {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("q242: the isotonic fit is non-decreasing and bracketed by the series range") {
    val r = rows("q242_isotonic_pav")
    val fitted = r.map(_.getAs[Long]("fitted_cents"))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      "minimax identity must produce a monotone fit")
    val v = r.map(_.getAs[Long]("v_cents"))
    assert(fitted.head >= v.min - 1 && fitted.last <= v.max,
      "fit must stay inside the observed range (floor slack 1 cent)")
  }

  test("q244: Shapley efficiency — credits sum to n!·(v(N) − v(∅))") {
    import org.apache.spark.sql.functions._
    val phiSum = rows("q244_shapley_attribution")
      .map(_.getAs[Long]("phi_num")).sum
    // v(N) = all converters; v(∅) = converters with an empty coalition
    val ev = Tables.events(spark, sf)
    val firstp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts")).as("fp"))
    val vN = firstp.count()
    val withPre = ev.join(firstp, Seq("user_id"))
      .filter(col("ts") < col("fp") && col("event_type") =!= "purchase")
      .select(col("user_id")).distinct().count()
    val vEmpty = vN - withPre
    assert(phiSum === 24L * (vN - vEmpty),
      "Shapley values must exactly distribute the coalition value")
  }

  test("ml_decision_tree: depth-2 accuracy is at least the majority-class baseline") {
    import org.apache.spark.sql.functions._
    val r = rows("ml_decision_tree").head
    val n = r.getAs[Long]("n")
    val acc = r.getAs[Long]("acc_bp")
    val pos = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").count()
    val majority = math.max(pos, n - pos) * 10000 / n
    assert(acc >= majority, s"tree acc $acc bp < majority baseline $majority bp")
  }

  test("ml_gbt_stumps: the second boosting round does not worsen the training fit") {
    val r = rows("ml_gbt_stumps").head
    assert(r.getAs[Long]("mae2_milli") <= r.getAs[Long]("mae1_milli"),
      "round-2 stump fitted on residuals must not increase mean |residual|")
  }

  test("graph_ktruss: peeling is monotone (edges and vertices never grow)") {
    val r = rows("graph_ktruss").sortBy(_.getAs[Int]("round"))
    val e = r.map(_.getAs[Long]("n_dir_edges"))
    val v = r.map(_.getAs[Long]("n_vertices"))
    assert(e.zip(e.tail).forall { case (a, b) => b <= a })
    assert(v.zip(v.tail).forall { case (a, b) => b <= a })
  }

  test("text_fleiss_kappa: kappa and agreement components stay in their ranges") {
    val r = rows("text_fleiss_kappa").head
    val pbar = r.getAs[Long]("pbar_bp")
    val pe = r.getAs[Long]("pe_bp")
    val k = r.getAs[Long]("kappa_micro")
    assert(pbar >= 0 && pbar <= 10000)
    assert(pe >= 0 && pe <= 10000)
    assert(k >= -1000000 && k <= 1000000)
  }

  test("q243: the SPRT decision is consistent with the extremes of the LLR path") {
    val r = rows("q243_sprt_ab").head
    val dec = r.getAs[String]("decision")
    val mx = r.getAs[Long]("llr_max_micro")
    val mn = r.getAs[Long]("llr_min_micro")
    val A = math.floor(math.log(0.95 / 0.05) * 1e6).toLong
    val B = math.floor(math.log(0.05 / 0.95) * 1e6).toLong
    if (dec == "continue") assert(mx < A && mn > B)
    else assert(mx >= A || mn <= B)
  }

  test("q254: Cox score at zero agrees in sign with the log-rank z; Newton contracts it") {
    val cox = rows("q254_cox_binary").head
    val u0 = cox.getAs[Long]("u0_micro")
    val z = rows("q252_logrank_test").head.getAs[Long]("z_milli")
    assert((u0 >= 0) === (z >= 0),
      "the partial-likelihood score at beta = 0 IS the log-rank numerator")
    val u1 = cox.getAs[Long]("u1_micro")
    assert(math.abs(u1) <= math.abs(u0),
      "a Newton step on a concave log-likelihood shrinks the score")
    val b2 = cox.getAs[Long]("b2_micro")
    val hr = cox.getAs[Long]("hr_milli")
    assert(hr >= 0)
    if (b2 > 0) assert(hr >= 1000, "e^beta > 1 for beta > 0")
    if (b2 < 0) assert(hr < 1000, "e^beta < 1 for beta < 0")
    assert(cox.getAs[Long]("i0_micro") > 0 && cox.getAs[Long]("i1_micro") > 0,
      "Fisher information of a non-degenerate census is positive")
  }

  test("q255: template match counts nest and SampEn is nonnegative when defined") {
    val r = rows("q255_sample_entropy").head
    val (np, b, a) = (r.getAs[Long]("n_pairs"),
      r.getAs[Long]("b_pairs"), r.getAs[Long]("a_pairs"))
    assert(a <= b && b <= np, "an (m+1)-match is an m-match is a pair")
    assert(r.getAs[Long]("r_tol") >= 0)
    val nDays = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(r.getAs[Long]("n_days") === nDays)
    if (!r.isNullAt(r.fieldIndex("sampen_milli")))
      assert(r.getAs[Long]("sampen_milli") >= 0, "B >= A forces ln(B/A) >= 0")
  }

  test("ml_fisher_lda: counts partition the corpus and the discriminant is max-normalized") {
    val r = rows("ml_fisher_lda").head
    val n = r.getAs[Long]("n")
    assert(n === r.getAs[Long]("tp") + r.getAs[Long]("fp")
      + r.getAs[Long]("fn") + r.getAs[Long]("tn"))
    assert(n === r.getAs[Long]("n1") + r.getAs[Long]("n0"))
    val (wx, wy) = (r.getAs[Long]("wx_micro"), r.getAs[Long]("wy_micro"))
    val mx = math.max(math.abs(wx), math.abs(wy))
    // 1e6·w evaluates BEFORE /m in the shared text, so the product's
    // IEEE rounding can push the floored ratio one ulp past ±1e6
    assert(mx >= 999999L && mx <= 1000001L,
      "max-normalization pins the larger coefficient at 1e6 (floor slack 1)")
    assert(r.getAs[Long]("acc_bp") >= 0 && r.getAs[Long]("acc_bp") <= 10000)
  }

  test("cf_slope_one: support-ordered pair panel with a nonnegative integer MAE") {
    val r = rows("cf_slope_one")
    assert(r.length === 10)
    val nij = r.map(_.getAs[Long]("nij"))
    assert(nij.zip(nij.tail).forall { case (a, b) => a >= b },
      "panel is ordered by pair support")
    assert(r.head.getAs[Long]("mae_milli") >= 0)
    assert(r.head.getAs[Long]("n_preds") > 0 && r.head.getAs[Long]("n_pairs") >= 10)
    assert(r.forall(x => x.getAs[Long]("part_i") < x.getAs[Long]("part_j")),
      "deviation pairs are stored under the i < j total order")
  }

  test("dedup_edit_verify: every Jaccard candidate is scored, similarity bounded") {
    val r = rows("dedup_edit_verify")
    assert(r.length === rows("dedup_ngram_jaccard").length,
      "the verify stage preserves the candidate list 1:1")
    assert(r.forall { x =>
      val (dist, len, bp) = (x.getAs[Long]("edit_dist"),
        x.getAs[Long]("max_len"), x.getAs[Long]("edit_sim_bp"))
      dist >= 0 && dist <= len && bp >= 0 && bp <= 10000
    }, "levenshtein on prefixes is bounded by the longer prefix")
  }

  test("text_yule_k / text_good_turing: spectrum identities hold across the pair") {
    val y = rows("text_yule_k").head
    val (n, v) = (y.getAs[Long]("n_tokens"), y.getAs[Long]("vocab"))
    assert(v <= n && y.getAs[Long]("hapax") <= v)
    assert(y.getAs[Long]("yule_k_milli") >= 0, "S2 >= N always (m^2 >= m)")
    assert(y.getAs[Long]("simpson_micro") >= 0 && y.getAs[Long]("simpson_micro") <= 1000000L)
    assert(y.getAs[Long]("herdan_c_milli") <= 1000L, "V <= N forces lnV/lnN <= 1")
    val gt = rows("text_good_turing")
    assert(gt.length === 5)
    assert(gt.head.getAs[Long]("v_r") === y.getAs[Long]("hapax"),
      "the r = 1 spectrum cell IS the hapax count")
    assert(gt.head.getAs[Long]("v_r1") === y.getAs[Long]("dis_legomena"))
    assert(gt.head.getAs[Long]("p_unseen_bp") === (10000L * y.getAs[Long]("hapax")) / n)
  }

  test("q256: power shares form a floored distribution and entropy is normalized") {
    val r = rows("q256_spectral_entropy")
    assert(r.length === 16)
    assert(r.forall(_.getAs[Long]("power_micro") >= 0))
    val shareSum = r.map(_.getAs[Long]("share_micro")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - 16,
      "floored shares must sum to 1e6 within one floor per cell")
    val hn = r.head.getAs[Long]("h_norm_milli")
    assert(hn >= 0 && hn <= 1000, "entropy normalized by ln(16) lives in [0, 1]")
    val p2 = r.find(_.getAs[Long]("period") === 2L).get
    assert(p2.getAs[Long]("rs_micro") === 0L,
      "the period-2 sine factor is identically zero (guarded correlation)")
  }

  test("q257: observed cells partition the orders and chi2 totals its contributions") {
    val r = rows("q257_poisson_gof")
    // orders with at least one line — sf0.001 has a few lineless orders
    val nOrders = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.col("l_orderkey")).distinct().count()
    assert(r.map(_.getAs[Long]("obs")).sum === nOrders)
    assert(r.forall(_.getAs[Long]("contrib_milli") >= 0))
    assert(r.head.getAs[Long]("chi2_milli") === r.map(_.getAs[Long]("contrib_milli")).sum)
    assert(r.head.getAs[Long]("df") === r.length - 2)
    val eSum = r.map(_.getAs[Long]("e_milli")).sum
    assert(eSum <= 1000L * nOrders && eSum >= 1000L * nOrders - 1000L * r.length,
      "expected counts renormalize to n within per-cell floor slack")
  }

  test("q258: the Bass fit explains at most all the variance") {
    val r = rows("q258_bass_diffusion").head
    assert(r.getAs[Long]("r2_milli") <= 1000L)
    val nDays = Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    assert(r.getAs[Long]("n_days") === nDays)
  }

  test("ml_gmm_em: responsibilities stay proper and components stay inside the data range") {
    val r = rows("ml_gmm_em").head
    for (c <- Seq("pi1_r1", "pi1_r2")) {
      val v = r.getAs[Long](c)
      assert(v >= 1 && v <= 999, s"$c: mixture weight clamped to (0, 1)")
    }
    assert(r.getAs[Long]("mu1_0") <= r.getAs[Long]("mu2_0"),
      "init components are the ordered quartiles")
    for (c <- Seq("var_0", "var_r1", "var_r2"))
      assert(r.getAs[Long](c) >= 1, s"$c: tied variance clamped positive")
    import org.apache.spark.sql.functions._
    val mm = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).as("c"))
      .selectExpr("c DIV 100000 AS x").agg(min("x"), max("x")).head
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    for (c <- Seq("mu1_r1", "mu2_r1", "mu1_r2", "mu2_r2")) {
      val v = r.getAs[Long](c)
      assert(v >= lo && v <= hi, s"$c: a responsibility-weighted mean is a convex combination")
    }
  }

  test("q259: bands bracket the KM curve and tie out to q98 exactly") {
    val gw = rows("q259_greenwood_bands")
    val km = rows("q98_survival_km")
    assert(gw.length === km.length)
    gw.zip(km).foreach { case (g, k) =>
      assert(g.getAs[Number]("t_days").longValue === k.getAs[Number]("t_days").longValue)
      assert(g.getAs[String]("survival") === k.getAs[String]("survival"),
        "the banded curve IS q98's curve, bit for bit")
    }
    gw.foreach { g =>
      val (s0, lo, hi) = (g.getAs[String]("survival").toDouble,
        g.getAs[String]("ci_lo").toDouble, g.getAs[String]("ci_hi").toDouble)
      assert(lo <= s0 + 1e-12 && s0 <= hi + 1e-12, "bands must bracket the estimate")
      assert(g.getAs[String]("greenwood_se").toDouble >= 0.0)
    }
  }

  test("graph_pseudo_diameter: the second sweep can only widen the bound") {
    val r = rows("graph_pseudo_diameter").head
    val (e1, e2) = (r.getAs[Long]("ecc1"), r.getAs[Long]("pseudo_diameter"))
    assert(e2 >= e1, "ecc(farthest) >= dist(seed, farthest) on an undirected graph")
    assert(r.getAs[Long]("n_reach1") >= 1 && r.getAs[Long]("n_reach2") >= 1)
    // the flag may legitimately be 0 or 1 on real data, but only 0/1
    assert(Set(0L, 1L).contains(r.getAs[Long]("frontier_exhausted")))
  }

  test("graph_pseudo_diameter: the frontier flag distinguishes budget truncation from exhaustion") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // PATH deeper than the hop budget: 0-1-2-...-9 (9 hops end to end).
    // From seed 0 the sweep visits 0..Hops and the probe hop still has
    // an unvisited vertex -> remaining > 0 (budget-truncated).
    val deep = (0 until 9).map(i => (s"d$i", s"d${i + 1}"))
    val deepEdges = (deep ++ deep.map(_.swap)).toDF("src", "dst")
    val seed = deepEdges.agg(min($"src").as("doc_id"))
    val (vDeep, remDeep) = operators.GraphQueries4.bfs(deepEdges, seed)
    assert(vDeep.count() === operators.GraphQueries4.Hops + 1,
      "a path visits exactly one new vertex per hop")
    assert(remDeep.head().getAs[Long]("remaining") > 0,
      "a 9-hop path must trip the budget-truncation probe")
    // STAR of 5 leaves: everything is reached at hop 1, the probe
    // finds nothing -> remaining == 0 (true eccentricity).
    val star = (1 to 5).map(i => ("hub", s"leaf$i"))
    val starEdges = (star ++ star.map(_.swap)).toDF("src", "dst")
    val (vStar, remStar) =
      operators.GraphQueries4.bfs(starEdges, starEdges.agg(min($"src").as("doc_id")))
    assert(vStar.count() === 6)
    assert(remStar.head().getAs[Long]("remaining") === 0,
      "an exhausted frontier must report remaining = 0")
  }

  test("cf_rec_coverage: the audit counts tie out to the rec table it audits") {
    val r = rows("cf_rec_coverage").head
    assert(r.getAs[Long]("n_recs") === rows("cf_user_recs").length,
      "coverage audits exactly the cf_user_recs output")
    assert(r.getAs[Long]("n_recs") <= 3 * r.getAs[Long]("n_users"))
    assert(r.getAs[Long]("coverage_bp") >= 0 && r.getAs[Long]("coverage_bp") <= 10000)
    val k = r.getAs[Long]("n_rec_items")
    assert(r.getAs[Long]("top_item_share_bp") >= 10000 / k,
      "the top item holds at least the average share")
    val en = r.getAs[Long]("entropy_norm_milli")
    assert(en >= 0 && en <= 1000)
  }

  test("q260: the residual DF regression pulls toward zero and the verdict matches t") {
    val r = rows("q260_cointegration_eg").head
    assert(r.getAs[Long]("m") === r.getAs[Long]("n_days") - 1)
    val rho = r.getAs[Long]("rho_micro")
    assert(rho >= -2000000L && rho <= 0L,
      "a stationary-or-unit-root residual has rho-hat in [-2, 0] in the DF form")
    val t = r.getAs[Long]("t_milli")
    assert((t < -3340) === (r.getAs[Long]("cointegrated_5pct") === 1L))
  }

  test("q261: tail overlaps are bounded by the decile size and lifts are consistent") {
    val r = rows("q261_tail_dependence").head
    val k = r.getAs[Long]("decile_days")
    assert(k === r.getAs[Long]("n_days") / 10)
    for (c <- Seq("n_upper", "n_lower")) {
      val v = r.getAs[Long](c)
      assert(v >= 0 && v <= k, s"$c: tail intersection can't exceed the tail")
    }
    assert(r.getAs[Long]("lambda_upper_bp") <= 10000L)
    assert(r.getAs[Long]("lambda_lower_bp") <= 10000L)
  }

  test("text_burrows_delta: a full pair panel of bounded distances; z-scores centered") {
    val r = rows("text_burrows_delta")
    val srcs = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("source")).distinct().count()
    assert(r.length === srcs * (srcs - 1) / 2, "all unordered source pairs appear")
    assert(r.forall(_.getAs[Long]("n_tokens") === 30L))
    assert(r.forall(_.getAs[Long]("delta_milli") >= 0))
    assert(r.forall(x => x.getAs[String]("s1") < x.getAs[String]("s2")))
  }

  test("q262: overlap metrics agree and RBO stays a truncated probability") {
    val r = rows("q262_rank_turnover").head
    val (k, ov) = (r.getAs[Long]("k"), r.getAs[Long]("ov_k"))
    assert(k === 20L && ov >= 0 && ov <= k)
    assert(r.getAs[Long]("jaccard_bp") === 10000 * ov / (2 * k - ov))
    assert(r.getAs[Long]("turnover_bp") === 10000 * (k - ov) / k)
    val rbo = r.getAs[Long]("rbo_nano")
    assert(rbo >= 0 && rbo <= 1000000000L, "truncated RBO lives in [0, 1]")
  }

  test("q263: AM-GM bounds the Atkinson index into [0, 1]") {
    val r = rows("q263_atkinson_index").head
    assert(r.getAs[Long]("geomean_cents") <= r.getAs[Long]("mean_cents"),
      "the geometric mean never exceeds the arithmetic mean")
    val a = r.getAs[Long]("atkinson_milli")
    assert(a >= 0 && a <= 1000)
  }

  test("q250: CUPED preserves arm sizes and bounds the variance reduction by rho^2") {
    val r = rows("q250_cuped_adjust").head
    assert(r.getAs[Long]("n") === r.getAs[Long]("na") + r.getAs[Long]("nb"))
    val vr = r.getAs[Long]("var_reduction_bp")
    assert(vr >= 0 && vr <= 10000, "1 - var(Yadj)/var(Y) = rho^2 in [0, 1]")
  }

  test("ml_pr_curve: recall is monotone along the threshold sweep and ends at 100%") {
    val r = rows("ml_pr_curve") // emitted sc DESC = sweep order
    assert(r.length === 50)
    val rec = r.map(_.getAs[Long]("recall_bp"))
    assert(rec.zip(rec.tail).forall { case (a, b) => b >= a },
      "lowering the threshold can only add true positives")
    assert(rec.last === 10000L, "threshold at min score predicts everything positive")
    val prec = r.map(_.getAs[Long]("precision_bp"))
    assert(prec.forall(p => p >= 0 && p <= 10000))
    val ap = r.head.getAs[Long]("ap_e4")
    assert(ap >= prec.min && ap <= prec.max,
      "AP is a Δrecall-weighted mean of precisions — bracketed by them")
  }

  test("ml_confusion_metrics: counts partition the corpus and agree with the PR sweep") {
    val cm = rows("ml_confusion_metrics").head
    val n = cm.getAs[Long]("n")
    assert(n === Tables.lineitem(spark, sf).count())
    // the PR curve's sc=26 operating point IS this classifier (>25)
    val pr26 = rows("ml_pr_curve").find(_.getAs[Long]("sc") === 26L).get
    assert(pr26.getAs[Long]("tp") === cm.getAs[Long]("tp"))
    assert(pr26.getAs[Long]("precision_bp") === cm.getAs[Long]("precision_bp"))
    for (c <- Seq("mcc_milli", "kappa_milli")) {
      val v = cm.getAs[Long](c)
      assert(v >= -1000L && v <= 1000L, s"$c out of range: $v")
    }
  }

  test("q253: Hotelling T-square is a nonnegative quadratic form and F shrinks it") {
    val r = rows("q253_hotelling_t2").head
    assert(r.getAs[Long]("n") === r.getAs[Long]("n1") + r.getAs[Long]("n0"))
    val t2 = r.getAs[Long]("t2_milli")
    assert(t2 >= 0, "d'W^-1 d with positive-definite W cannot be negative")
    val f = r.getAs[Long]("f_milli")
    assert(f >= 0 && f <= t2 / 2 + 1, "(n-3)/(2(n-2)) < 1/2 at any real n")
  }

  test("q251: pairwise and partial correlations are all inside [-1, 1]") {
    val r = rows("q251_partial_corr").head
    for (c <- Seq("rxy_micro", "rxz_micro", "ryz_micro", "partial_micro")) {
      val v = r.getAs[Long](c)
      assert(v >= -1000000L && v <= 1000000L, s"$c out of range: $v")
    }
  }

  test("q252: at-risk counts telescope from the death census") {
    val r = rows("q252_logrank_test").sortBy(_.getAs[Long]("t"))
    val n1 = r.map(_.getAs[Long]("n1"))
    assert(n1.zip(n1.tail).forall { case (a, b) => a >= b },
      "risk sets can only shrink in t")
    assert(n1.head === r.map(_.getAs[Long]("d1")).sum,
      "everyone is at risk at the first event time")
    assert(r.map(_.getAs[Long]("v_micro")).forall(_ >= 0))
    // z sign must agree with the O1 - E1 micro totals it came from
    val diff = 1000000L * r.map(_.getAs[Long]("d1")).sum -
      r.map(_.getAs[Long]("e1_micro")).sum
    val z = r.head.getAs[Long]("z_milli")
    assert((diff >= 0) === (z >= 0),
      "z (floored) and the O1-E1 micro total must agree in sign")
  }

  test("ml_platt_scaling: fitted sigmoid is monotone over the score cells") {
    val r = rows("ml_platt_scaling").sortBy(_.getAs[Long]("sc"))
    assert(r.length === 50)
    val p = r.map(_.getAs[Long]("p_nano"))
    val up = p.zip(p.tail).forall { case (a, b) => b >= a }
    val down = p.zip(p.tail).forall { case (a, b) => b <= a }
    assert(up || down, "sigma(a*s + b) is monotone in s")
    assert(p.forall(x => x >= 0 && x <= 1000000000L))
    assert(r.head.getAs[Long]("ece_e4") >= 0)
  }

  test("q248: the EWMA trace stays inside the observed series range") {
    val r = rows("q248_ewma_chart")
    val lo = r.map(_.getAs[Long]("v_cents")).min * 1000
    val hi = r.map(_.getAs[Long]("v_cents")).max * 1000
    assert(r.forall { row =>
      val z = row.getAs[Long]("z_milli"); z >= lo - 1000 && z <= hi + 1000
    }, "a convex-combination recursion cannot leave the data range")
  }

  test("q249: ESD rounds test shrinking sets and distinct outlier days") {
    val r = rows("q249_seasonal_esd").sortBy(_.getAs[Int]("round"))
    assert(r.length === 3)
    val ns = r.map(_.getAs[Long]("n_tested"))
    assert(ns(1) === ns(0) - 1 && ns(2) === ns(1) - 1)
    assert(r.map(_.getAs[String]("outlier_day")).distinct.length === 3)
    assert(r.forall(_.getAs[Long]("g_milli") > 0))
  }

  test("cf_als_rank1: factor table and train MAE are well-formed") {
    val r = rows("cf_als_rank1")
    assert(r.length === 10)
    assert(r.forall(_.getAs[Long]("vm") > 0), "quantity ratings are positive")
    assert(r.head.getAs[Long]("mae_milli") >= 0)
    val vms = r.map(_.getAs[Long]("vm"))
    assert(vms.zip(vms.tail).forall { case (a, b) => b <= a }, "top-10 ordered by vm")
  }

  test("samp_kcenter_coreset: farthest-point coverage radii are non-increasing") {
    val r = rows("samp_kcenter_coreset").sortBy(_.getAs[Int]("pick"))
    assert(r.head.getAs[Long]("mindist") === 0L, "seed has no prior centers")
    val radii = r.tail.map(_.getAs[Long]("mindist"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      "each added center can only shrink the farthest distance")
    assert(r.map(_.getAs[Long]("vec_id")).distinct.length === r.length)
  }

  test("ml_bagging_stumps: ensemble accuracy is at least the majority-class baseline") {
    import org.apache.spark.sql.functions._
    val r = rows("ml_bagging_stumps")
    assert(r.length === 8)
    val n = r.head.getAs[Long]("n")
    val acc = r.head.getAs[Long]("ens_acc_bp")
    val pos = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").count()
    assert(acc >= math.max(pos, n - pos) * 10000 / n)
  }

  test("feat_cyclical_encode: the quantized encoding stays on the unit circle") {
    val r = rows("feat_cyclical_encode")
    assert(r.length === 12)
    assert(r.forall { row =>
      val s = row.getAs[Long]("sin_nano").toDouble
      val c = row.getAs[Long]("cos_nano").toDouble
      math.abs(s * s + c * c - 1e18) < 1e10 // ≤1-nano floor per leg
    })
  }

  test("q245: the AD statistic is a sum of non-negative weighted gaps") {
    val r = rows("q245_anderson_darling").head
    assert(r.getAs[Long]("a2_micro") >= 0)
    assert(r.getAs[Long]("n_points") >= 1)
  }

  test("q246: KPSS eta is positive and finite on a non-constant series") {
    val eta = rows("q246_kpss_level").head.getAs[Long]("eta_micro")
    assert(eta > 0 && eta < 100000000L)
  }

  test("q247: binseg picks two distinct changepoints with positive gains") {
    val r = rows("q247_binseg_changepoints").head
    assert(r.getAs[String]("cp1_day") !== r.getAs[String]("cp2_day"))
    assert(r.getAs[Long]("g1_norm") >= 0 && r.getAs[Long]("g2_norm") >= 0,
      "SSE split gain is non-negative by construction")
  }

  test("dedup_cdc_chunks: census totals are internally consistent") {
    val r = rows("dedup_cdc_chunks")
    assert(r.nonEmpty)
    val h = r.head
    assert(h.getAs[Long]("total_chunks") >= h.getAs[Long]("distinct_chunks"))
    assert(h.getAs[Long]("dup_chunk_mass") >= h.getAs[Long]("n_occ"),
      "the top repeated chunk's occurrences are part of the dup mass")
    assert(r.forall(_.getAs[Long]("n_occ") > 1))
  }

  test("ml_mutual_info_rank: MI of every feature is non-negative up to quantization slack") {
    val r = rows("ml_mutual_info_rank")
    assert(r.length === 4)
    // each cell term floors by at most 1 nano; ≤62 cells of slack
    assert(r.forall(_.getAs[Long]("mi_nano") >= -62L),
      "I(F;Y) is non-negative; quantized sum may undershoot by ≤1 nano/cell")
  }
}
