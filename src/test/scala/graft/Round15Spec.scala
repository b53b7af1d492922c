package graft

/** Behavioral invariants of the round-15 operators — properties the
  * hash gate can't express (it pins values, not the math behind them). */
class Round15Spec extends SparkSuite {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("graph_katz_centrality: every score clears the base + degree floor") {
    // x ≥ 1000 + (200·1000·deg) DIV 1000 — each neighbor contributes
    // at least the base injection
    rows("graph_katz_centrality").foreach { r =>
      assert(r.getAs[Long]("katz_milli") >=
        1000L + 200L * r.getAs[Long]("degree"),
        "Katz score below its analytic floor")
    }
  }

  test("graph_component_census: sizes tie out to the document corpus") {
    val r = rows("graph_component_census")
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.map(x => x.getAs[Long]("docs_in_size")).sum === nDocs,
      "size histogram must partition the corpus exactly")
    assert(r.map(_.getAs[Long]("comp_size")).distinct.length === r.length)
  }

  test("q264_seq_contain: support is a fraction of the antecedent cohort") {
    rows("q264_seq_contain").foreach { r =>
      assert(r.getAs[Long]("n_users_ab") <= r.getAs[Long]("n_users_a"))
      assert(r.getAs[Long]("support_bp") >= 0 && r.getAs[Long]("support_bp") <= 10000)
    }
  }

  test("q265_session_trigrams: trigrams are 3-step paths with positive mass") {
    rows("q265_session_trigrams").foreach { r =>
      assert(r.getAs[String]("trigram").count(_ == '>') === 2)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_occurrences"))
    }
  }

  test("q266_elo_daily: wins tie out and ratings stay in the update envelope") {
    val r = rows("q266_elo_daily")
    val total = r.head.getAs[Long]("n_matches_total")
    assert(r.map(_.getAs[Long]("n_wins")).sum === total,
      "every match has exactly one winner")
    assert(r.map(_.getAs[Long]("n_matches")).sum === 2 * total,
      "every match has exactly two players")
    r.foreach { x =>
      val m = x.getAs[Long]("n_matches")
      val elo = x.getAs[Long]("elo_rating")
      // per match the rating moves at most K = 32 points
      assert(elo >= 1000 - 32 * m && elo <= 1000 + 32 * m)
    }
  }

  test("q267_lorenz_deciles: the curve is convex-ordered and lands on 100%") {
    val r = rows("q267_lorenz_deciles").sortBy(_.getAs[Long]("decile"))
    assert(r.length === 10)
    val shares = r.map(_.getAs[Long]("share_bp"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "deciles are revenue-ascending, so shares must be non-decreasing")
    assert(r.last.getAs[Long]("cum_share_bp") === 10000)
    val cums = r.map(_.getAs[Long]("cum_share_bp"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }

  test("q268_ansari_bradley: the two group statistics partition the pooled score mass") {
    val r = rows("q268_ansari_bradley").head
    assert(r.getAs[Long]("n_total") ===
      r.getAs[Long]("n_a") + r.getAs[Long]("n_r"))
    assert(r.getAs[Long]("ab_a_milli") > 0 && r.getAs[Long]("ab_r_milli") > 0)
    // mean AB score per observation is ≤ (N+1)/2 (the max score)
    val perObsA = r.getAs[Long]("ab_a_milli") / math.max(r.getAs[Long]("n_a"), 1)
    assert(perObsA <= 1000L * (r.getAs[Long]("n_total") + 1) / 2)
  }

  test("q269_dagostino_k2: K² is the sum of the squared component z-scores") {
    rows("q269_dagostino_k2").foreach { r =>
      val z1 = r.getAs[String]("z_skew").toDouble
      val z2 = r.getAs[String]("z_kurt").toDouble
      val k2 = r.getAs[String]("k2_stat").toDouble
      assert(math.abs(z1 * z1 + z2 * z2 - k2) < 1e-4)
      assert(k2 >= 0.0)
    }
  }

  test("q270_page_hinkley: drift is non-negative and alarms are bounded by days") {
    rows("q270_page_hinkley").foreach { r =>
      assert(r.getAs[Long]("max_ph") >= 0, "PH = u - running_min(u) >= 0")
      assert(r.getAs[Long]("n_alarm_days") <= r.getAs[Long]("n_days"))
      val first = r.getAs[String]("first_alarm_day")
      assert((r.getAs[Long]("n_alarm_days") > 0) === (first != null),
        "first alarm day present iff any alarm fired")
    }
  }

  test("ml_lof_cells: interior grid cells score near 1, corners can't be negative") {
    val r = rows("ml_lof_cells")
    r.foreach { x =>
      assert(x.getAs[Long]("lof_milli") > 0)
      assert(x.getAs[Long]("cnt") > 0)
    }
  }

  test("ml_model_agreement: confusion cells partition the corpus; kappa <= observed agreement") {
    val r = rows("ml_model_agreement").head
    val n = r.getAs[Long]("n")
    assert(n === r.getAs[Long]("n11") + r.getAs[Long]("n10") +
      r.getAs[Long]("n01") + r.getAs[Long]("n00"))
    assert(n === Tables.lineitem(spark, sf).count())
    val po = r.getAs[Long]("po_milli")
    assert(po >= 0 && po <= 1000)
    assert(r.getAs[Long]("kappa_milli") <= po + 1,
      "chance-corrected agreement cannot exceed raw agreement (milli slack 1)")
  }

  test("q271_absorbing_steps: expected steps are at least one and grow with the series") {
    rows("q271_absorbing_steps").foreach { r =>
      val t = r.getAs[Long]("exp_steps_milli")
      // the series is truncated at 8 terms of ≤1 each, plus the base —
      // the value is bracketed by [1, 9] steps by construction
      assert(t >= 1000 && t <= 9000, s"truncated series out of range: $t")
      assert(r.getAs[String]("state") != "purchase", "absorbing state must not appear")
    }
  }

  test("q272_conversion_lag: cumulative share is monotone and ends at 100%") {
    val r = rows("q272_conversion_lag").sortBy(_.getAs[Long]("lag_days"))
    val cums = r.map(_.getAs[Long]("cum_share_bp"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last === 10000)
    assert(r.map(_.getAs[Long]("n_users")).sum === r.last.getAs[Long]("cum_users"))
  }

  test("q273_rfm_migration: row shares are per-origin-quintile distributions") {
    val r = rows("q273_rfm_migration")
    r.groupBy(x => x.get(x.fieldIndex("q_h1")).toString).foreach { case (_, cell) =>
      val shareSum = cell.map(_.getAs[Long]("row_share_bp")).sum
      // floors can undershoot by at most (cells − 1)
      assert(shareSum <= 10000 && shareSum >= 10000 - cell.length + 1)
    }
  }

  test("q274_growth_accounting: actives decompose exactly; week 1 is all-new") {
    val r = rows("q274_growth_accounting").sortBy(_.getAs[String]("week_start"))
    r.foreach { x =>
      assert(x.getAs[Long]("n_active") ===
        x.getAs[Long]("n_new") + x.getAs[Long]("n_retained") +
          x.getAs[Long]("n_resurrected"))
    }
    assert(r.head.getAs[Long]("n_new") === r.head.getAs[Long]("n_active"),
      "the first week has no history to retain from")
    assert(r.head.getAs[Long]("n_churned") === 0)
  }

  test("text_fano_factor: function-word Fano factors are finite and df <= tf") {
    rows("text_fano_factor").foreach { r =>
      assert(r.getAs[Long]("df") <= r.getAs[Long]("tf"))
      // Fano of a non-degenerate count distribution: > -1000 by
      // construction (variance >= 0 up to quantization)
      assert(r.getAs[Long]("fano_milli") >= -1)
    }
  }

  test("text_repeated_shingles: repetition share is a proper fraction") {
    rows("text_repeated_shingles").foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_shingles"))
      val m = r.getAs[Long]("repeat_milli")
      assert(m >= 0 && m < 1000)
    }
  }

  test("q275_pettitt_test: K is bounded by the analytic rank-sum maximum") {
    rows("q275_pettitt_test").foreach { r =>
      val (n, k) = (r.getAs[Long]("n_days"), r.getAs[Long]("k_stat"))
      // |U_t| ≤ t(n−t) · max rank spread ≤ n²/2 loose bound; exact
      // ceiling for U on midranks is t(n−t) ≤ n²/4 doubled ranks
      assert(k >= 0 && k <= n * n / 2, s"K=$k out of range for n=$n")
      assert(r.getAs[String]("p_approx").toDouble >= 0.0)
      assert(r.getAs[String]("change_day") != null)
    }
  }

  test("q276_cliffs_delta: dominance counts partition the pair mass") {
    val r = rows("q276_cliffs_delta").head
    assert(r.getAs[Long]("n_pairs") ===
      r.getAs[Long]("n_gt") + r.getAs[Long]("n_lt") + r.getAs[Long]("n_eq"))
    val dm = r.getAs[Long]("delta_milli")
    assert(dm >= -1000 && dm <= 1000)
  }

  test("q277_kendall_w: concordance lies in [0, 1]") {
    val w = rows("q277_kendall_w").head.getAs[String]("kendall_w").toDouble
    assert(w >= 0.0 && w <= 1.0 + 1e-9)
  }

  test("q278_hill_estimator: k order statistics, positive tail index") {
    val r = rows("q278_hill_estimator").head
    assert(r.getAs[Long]("k") <= 100)
    assert(r.getAs[Long]("sum_nano") > 0,
      "top-k values strictly above the threshold have positive log ratios")
    val gamma = r.getAs[String]("hill_gamma").toDouble
    val alpha = r.getAs[String]("tail_alpha").toDouble
    assert(gamma > 0 && math.abs(alpha * gamma - 1.0) < 1e-3)
  }

  test("q279_gumbel_maxima: return level exceeds the location parameter") {
    rows("q279_gumbel_maxima").foreach { r =>
      val mu = r.getAs[String]("gumbel_mu_usd").toDouble
      val beta = r.getAs[String]("gumbel_beta_usd").toDouble
      val rl = r.getAs[String]("return_level_30_usd").toDouble
      assert(beta > 0, "moment-fit scale must be positive on non-constant maxima")
      assert(rl > mu, "the 30-block return level sits above the mode")
    }
  }

  test("q280_turning_points: the count is bounded by the interior length") {
    rows("q280_turning_points").foreach { r =>
      assert(r.getAs[Long]("n_turning") <= r.getAs[Long]("n_days") - 2)
      assert(r.getAs[String]("expected_tp").toDouble > 0)
    }
  }

  test("samp_borda_fusion: Borda scores are consistent with the three ranks") {
    val r = rows("samp_borda_fusion")
    assert(r.length === 10)
    r.foreach { x =>
      val borda = x.getAs[Long]("borda")
      val rs = Seq("r_rev", "r_qty", "r_cnt").map(x.getAs[Long])
      assert(rs.forall(_ >= 1))
      // borda = 3n − Σranks is the same affine map for every row, so
      // order by borda == order by −Σranks
      assert(borda + rs.sum === r.map(y =>
        y.getAs[Long]("borda") + Seq("r_rev", "r_qty", "r_cnt").map(y.getAs[Long]).sum).head)
    }
    // at most one Condorcet winner in the audit
    assert(r.map(_.getAs[Long]("condorcet_top10")).sum <= 1)
  }

  test("ml_youden_j: exactly one best threshold; J = TPR - FPR everywhere") {
    val r = rows("ml_youden_j")
    assert(r.length === 14)
    assert(r.map(_.getAs[Long]("is_best")).sum === 1)
    r.foreach { x =>
      assert(x.getAs[Long]("j_bp") ===
        x.getAs[Long]("tpr_bp") - x.getAs[Long]("fpr_bp"))
      assert(x.getAs[Long]("tpr_bp") >= 0 && x.getAs[Long]("tpr_bp") <= 10000)
      assert(x.getAs[Long]("fpr_bp") >= 0 && x.getAs[Long]("fpr_bp") <= 10000)
    }
    val bestJ = r.filter(_.getAs[Long]("is_best") === 1).head.getAs[Long]("j_bp")
    assert(r.forall(_.getAs[Long]("j_bp") <= bestJ))
  }

  test("q281_markov_entropy: the rate is bounded by log of the state count") {
    val r = rows("q281_markov_entropy").head
    val bits = r.getAs[String]("h_rate_bits").toDouble
    assert(bits >= 0.0)
    // ≤ log2(#states); the chain has at most a handful of event types
    assert(bits <= math.log(32.0) / math.log(2.0))
    assert(r.getAs[Long]("n_cells") >= 1)
  }

  test("q282_bowley_skew: quartiles are ordered and the coefficients are bounded") {
    rows("q282_bowley_skew").foreach { r =>
      val (q1, q2, q3) = (r.getAs[Long]("q1"), r.getAs[Long]("q2"), r.getAs[Long]("q3"))
      assert(q1 <= q2 && q2 <= q3, "type-1 quartiles must be monotone")
      val b = r.getAs[Long]("bowley_milli")
      assert(b >= -1000 && b <= 1000)
      assert(r.getAs[Long]("qcd_milli") >= 0)
    }
  }

  test("q283_price_index: Fisher is the geometric mean of Laspeyres and Paasche") {
    val r = rows("q283_price_index").head
    val l = r.getAs[Long]("laspeyres_milli") / 1000.0
    val p = r.getAs[Long]("paasche_milli") / 1000.0
    val f = r.getAs[String]("fisher_index").toDouble
    assert(l > 0 && p > 0)
    assert(math.abs(f - math.sqrt(l * p)) < 5e-3,
      "Fisher must be the geometric mean up to milli quantization")
    assert(r.getAs[Long]("n_parts") > 0)
  }

  test("q284_forecast_eval: error masses are consistent and sMAPE is bounded") {
    rows("q284_forecast_eval").foreach { r =>
      assert(r.getAs[Long]("mae7_cents") >= 0 && r.getAs[Long]("mae1_cents") >= 0)
      val sm = r.getAs[Long]("smape_milli")
      assert(sm >= 0 && sm <= 2000, "sMAPE lives in [0, 200%]")
      assert(r.getAs[Long]("mase_milli") >= 0)
    }
  }

  test("q285_footrule_distance: the normalized distance is a proper fraction") {
    val r = rows("q285_footrule_distance").head
    val n = r.getAs[Long]("n_parts")
    val f = r.getAs[Long]("footrule")
    assert(f >= 0 && f <= n * n / 2, "footrule is bounded by its permutation maximum")
    val norm = r.getAs[Long]("footrule_norm_milli")
    assert(norm >= 0 && norm <= 1000)
  }

  test("q286_dispersion_test: the index is positive and D = index * (n-1)") {
    rows("q286_dispersion_test").foreach { r =>
      val d = r.getAs[String]("d_stat").toDouble
      val idx = r.getAs[String]("dispersion_index").toDouble
      val n = r.getAs[Long]("n")
      assert(d >= 0 && idx >= 0)
      assert(math.abs(d - idx * (n - 1)) < 1e-3 * math.max(1.0, d))
    }
  }

  test("samp_bandit_replay: plays partition the days; wins are bounded by plays") {
    val r = rows("samp_bandit_replay")
    val nDays = r.head.getAs[Long]("n_days")
    assert(r.map(_.getAs[Long]("n_plays")).sum === nDays,
      "the policy plays exactly one arm per day")
    r.foreach { x =>
      assert(x.getAs[Long]("n_wins") <= x.getAs[Long]("n_plays"))
      val m = x.getAs[Long]("mean_milli")
      assert(m >= 0 && m <= 1000)
    }
    assert(r.head.getAs[Long]("n_explore") <= nDays)
  }
}
