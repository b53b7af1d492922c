package graft

/** Behavioral invariants of the round-16 operators — properties the
  * hash gate can't express (it pins values, not the math behind them). */
class Round16Spec extends SparkSuite {

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("text_bpe_train: separator is absent from the token alphabet") {
    // the |-delimited sequence encoding is only sound if no corpus
    // token can contain the delimiter
    import org.apache.spark.sql.functions._
    val n = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").contains("|")).count()
    assert(n === 0L, "corpus tokens must not contain the '|' separator")
  }

  test("text_bpe_train: 8 ordered rounds with a monotone compression curve") {
    val r = rows("text_bpe_train")
    assert(r.length === 8)
    assert(r.map(_.getAs[Long]("round")).toSeq === (1L to 8L),
      "one merge per round, in order")
    r.foreach { x =>
      assert(x.getAs[String]("merged") ===
        x.getAs[String]("sym_a") + x.getAs[String]("sym_b"),
        "merged symbol is the concatenation of the pair")
      assert(x.getAs[Long]("pair_n") >= 1L)
    }
    // each merge collapses ≥1 pair occurrence → strictly fewer symbol
    // occurrences after every round
    val occ = r.map(_.getAs[Long]("occ_after")).toSeq
    assert(occ.zip(occ.tail).forall { case (a, b) => b < a },
      s"occ_after must strictly decrease: $occ")
    // the top pair's weighted count never grows round-over-round: a
    // new symbol's occurrences are bounded by the merge that made it
    val pn = r.map(_.getAs[Long]("pair_n")).toSeq
    assert(pn.zip(pn.tail).forall { case (a, b) => b <= a },
      s"top-pair count must be non-increasing: $pn")
  }

  test("text_bpe_apply: fertility floors hold and language rows are complete") {
    val r = rows("text_bpe_apply")
    assert(r.length === 5, "one fertility row per corpus language")
    r.foreach { x =>
      // every word is at least one piece; every piece at least one char
      assert(x.getAs[Long]("pieces_per_word_milli") >= 1000L)
      assert(x.getAs[Long]("chars_per_piece_milli") >= 1000L)
      assert(x.getAs[Long]("n_pieces") >= x.getAs[Long]("n_words"))
    }
  }

  test("text_bpe_vocab: census is ordered and merged subwords surface") {
    val r = rows("text_bpe_vocab")
    assert(r.length === 30)
    val occ = r.map(_.getAs[Long]("n_occ")).toSeq
    assert(occ.zip(occ.tail).forall { case (a, b) => b <= a }, "ordered by occurrences")
    // 8 merges on a 31-word corpus must promote at least one
    // multi-character symbol into the top-30
    assert(r.exists(_.getAs[Long]("sym_len") > 1L),
      "expected a merged (multi-char) symbol in the induced vocabulary")
    r.foreach(x => assert(x.getAs[Long]("sym_len") ===
      x.getAs[String]("sym").length.toLong))
  }

  test("dedup_curation_funnel: stage chain is conservative and consistent") {
    val r = rows("dedup_curation_funnel").sortBy(_.getAs[Long]("stage_id"))
    assert(r.map(_.getAs[String]("stage")).toSeq ===
      Seq("exact_dedup", "neardup_dedup", "quality_filter", "lang_filter"))
    assert(r.head.getAs[Long]("docs_in") ===
      Tables.documents(spark, sf).count(), "the funnel starts from the full corpus")
    r.foreach { x =>
      assert(x.getAs[Long]("docs_kept") <= x.getAs[Long]("docs_in"))
      val bp = x.getAs[Long]("drop_bp")
      assert(bp >= 0L && bp <= 10000L)
    }
    // each stage consumes exactly what the previous stage kept
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("docs_in") === a.getAs[Long]("docs_kept"),
        s"stage ${b.getAs[String]("stage")} input must chain from the previous stage")
    }
    // the corpus is built with real duplicate families — the dedup
    // stages must actually drop something
    assert(r.take(2).map(_.getAs[Long]("drop_bp")).sum > 0L,
      "expected the dedup stages to drop documents")
  }

  test("stream_lsh_dedup: verdicts respect the bucket-min order and band bounds") {
    val r = rows("stream_lsh_dedup")
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.length.toLong === nDocs, "one verdict per streamed document")
    r.foreach { x =>
      val hits = x.getAs[Long]("n_band_hits")
      assert(hits >= 0L && hits <= 16L, "hits bounded by the 16 bands")
      if (x.getAs[Boolean]("is_dup")) {
        assert(hits > 0L)
        // the matched owner claimed its bucket earlier => smaller id
        assert(x.getAs[Long]("first_match") < x.getAs[Long]("doc_id"),
          "a duplicate's first match must be an earlier document")
      } else {
        assert(hits === 0L && x.isNullAt(x.fieldIndex("first_match")))
      }
    }
    // the smallest doc can never be a duplicate (no earlier owner)
    assert(!r.minBy(_.getAs[Long]("doc_id")).getAs[Boolean]("is_dup"))
  }

  test("sim_cell_stats: cells partition the corpus and the balance read is coherent") {
    val r = rows("sim_cell_stats")
    assert(r.length === 8, "one row per IVF cell")
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_vecs")).sum === nVecs,
      "cell populations must partition the corpus")
    val maxShare = r.map(_.getAs[Long]("share_of_mean_bp")).max
    r.foreach { x =>
      assert(x.getAs[Long]("max_imbalance_bp") === maxShare,
        "the repeated imbalance scalar must equal the max cell share")
      assert(x.getAs[Long]("mean_norm2") > 0L)
    }
  }

  test("sim_probe_recall: the curve is monotone in probe count and bounded") {
    val r = rows("sim_probe_recall")
    assert(r.length === 15, "5 queries x 3 probe levels")
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (q, ps) =>
      val byProbe = ps.sortBy(_.getAs[Long]("n_probe"))
      val rec = byProbe.map(_.getAs[Long]("recall_bp"))
      val cand = byProbe.map(_.getAs[Long]("n_candidates"))
      assert(rec.zip(rec.tail).forall { case (a, b) => b >= a },
        s"query $q: recall must not drop as probes widen: ${rec.toSeq}")
      assert(cand.zip(cand.tail).forall { case (a, b) => b >= a },
        s"query $q: candidate volume grows with probes: ${cand.toSeq}")
      assert(rec.forall(v => v >= 0L && v <= 10000L))
    }
  }

  test("stream_semantic_dedup: verdicts are earlier-match consistent") {
    val r = rows("stream_semantic_dedup")
    assert(r.length.toLong === Tables.embeddings(spark, sf).count())
    r.foreach { x =>
      val dup = x.getAs[Boolean]("is_dup")
      val nm = x.getAs[Long]("n_matches")
      assert(dup === (nm > 0L))
      if (dup)
        assert(x.getAs[Long]("first_match") < x.getAs[Long]("vec_id"),
          "a duplicate's first match must be an earlier vector")
      else assert(x.getAs[Long]("first_match") === -1L)
    }
    // the streaming match mass equals the batch within-cell pair count
    // (every pair (v1 < v2) is counted exactly once, at its later end)
    val batchPairs = rows("dedup_semantic") // same cells, same threshold
    val multi = batchPairs.filter(_.getAs[Long]("n_members") > 1)
    assert(r.map(_.getAs[Long]("n_matches")).sum > 0L)
    assert(multi.nonEmpty)
  }

  test("dedup_semantic: verdicts partition the corpus, one rep per cluster") {
    val r = rows("dedup_semantic")
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(r.length.toLong === nVecs, "one verdict row per corpus vector")
    val byCluster = r.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_.getAs[Boolean]("keep")) === 1,
        s"cluster $cid must keep exactly one representative")
      assert(members.forall(_.getAs[Long]("n_members") === members.length.toLong),
        s"cluster $cid n_members must equal its actual size")
      assert(members.map(_.getAs[Long]("vec_id")).min === cid,
        s"cluster id must be the minimum member vec_id")
    }
    // the kept representative is always the cluster id itself
    r.filter(_.getAs[Boolean]("keep")).foreach { x =>
      assert(x.getAs[Long]("vec_id") === x.getAs[Long]("cluster_id"))
    }
    // cells index is total: every verdict carries a valid cell
    r.foreach(x => assert((0 until 8).contains(x.getAs[Int]("cell"))))
  }

  test("dedup_semantic: near-dup clusters exist and drops are the non-reps") {
    val r = rows("dedup_semantic")
    val dropped = r.count(!_.getAs[Boolean]("keep"))
    val multi = r.filter(_.getAs[Long]("n_members") > 1L)
    // threshold 0.35 yields real near-dup mass on this corpus (74+
    // pairs at sf0.001) — the op must actually drop something
    assert(multi.nonEmpty, "expected at least one multi-member cluster")
    assert(dropped.toLong ===
      multi.length.toLong - multi.map(_.getAs[Long]("cluster_id")).distinct.length,
      "drops = multi-cluster members minus their reps")
  }

  test("text_ccnet_buckets: tertiles are complete, balanced and ordered") {
    val r = rows("text_ccnet_buckets")
    assert(r.length === 15, "5 languages x 3 buckets")
    r.groupBy(_.getAs[String]("lang")).foreach { case (lang, bs) =>
      val byB = bs.map(x => x.getAs[String]("bucket") -> x).toMap
      assert(byB.keySet === Set("head", "middle", "tail"), s"$lang buckets")
      // NTILE balance: bucket sizes differ by at most one
      val sizes = bs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1L, s"$lang tertile balance: $sizes")
      // head = most corpus-typical: score ranges must not interleave
      assert(byB("head").getAs[Long]("min_ppm") >=
        byB("middle").getAs[Long]("max_ppm"), s"$lang head/middle boundary")
      assert(byB("middle").getAs[Long]("min_ppm") >=
        byB("tail").getAs[Long]("max_ppm"), s"$lang middle/tail boundary")
      bs.foreach { x =>
        assert(x.getAs[Long]("min_ppm") <= x.getAs[Long]("mean_ppm") &&
          x.getAs[Long]("mean_ppm") <= x.getAs[Long]("max_ppm"))
      }
    }
  }

  test("samp_dsir_weights: one row per doc and the target domain scores higher") {
    val r = rows("samp_dsir_weights")
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.length.toLong === nDocs, "one weight row per document")
    r.foreach { x =>
      val lean = x.getAs[Long]("n_target_leaning")
      assert(lean >= 0L && lean <= x.getAs[Long]("n_tokens"))
      assert(!x.getAs[String]("log_weight").isEmpty)
    }
    // DSIR's defining property: docs FROM the target domain average a
    // higher importance weight than the rest of the corpus
    val (tgt, rest) = r.partition(_.getAs[Boolean]("is_target"))
    def meanW(xs: Array[org.apache.spark.sql.Row]) =
      xs.map(_.getAs[String]("log_weight").toDouble).sum / xs.length
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(meanW(tgt) > meanW(rest),
      s"target-domain mean log-weight ${meanW(tgt)} must exceed ${meanW(rest)}")
  }

  test("samp_epoch_schedule: budget conserved, sqrt-temper favors small sources") {
    val r = rows("samp_epoch_schedule")
    assert(r.length === 20, "one row per source")
    val totToks = r.map(_.getAs[Long]("toks")).sum
    assert(r.map(_.getAs[Long]("target_toks")).sum === 2L * totToks,
      "largest-remainder apportionment must hand out the whole budget")
    r.foreach { x =>
      val w = x.getAs[Long]("weight"); val t = x.getAs[Long]("toks")
      assert(w * w <= t && t < (w + 1) * (w + 1), "weight = floor(sqrt(toks))")
      assert(x.getAs[Long]("epochs_milli") > 0L)
    }
    val byToks = r.sortBy(_.getAs[Long]("toks"))
    assert(byToks.head.getAs[Long]("epochs_milli") >=
      byToks.last.getAs[Long]("epochs_milli"),
      "the smallest source must be scheduled for at least as many epochs")
  }

  test("q287_mood_median: the 2xk table is conservative and chi2 is shared") {
    val r = rows("q287_mood_median")
    assert(r.length === 3, "one row per return flag")
    assert(r.map(_.getAs[Long]("chi2_micro")).distinct.length === 1,
      "the test statistic is a corpus scalar")
    r.foreach { x =>
      assert(x.getAs[Long]("n_above") <= x.getAs[Long]("n"))
      val m = x.getAs[Long]("median")
      assert(m >= 1L && m <= 50L, "grand median within the quantity domain")
    }
  }

  test("q288_quade_test: centered rank sums and a nonnegative statistic") {
    val r = rows("q288_quade_test")
    assert(r.length === 5, "one row per priority")
    // Σ_j S_j = 0 exactly: within-block tie-averaged ranks always sum
    // to k(k+1)/2, so the weighted centered sums cancel across
    // treatments — the integer identity the doubled-rank encoding
    // must preserve
    assert(r.map(_.getAs[Long]("s_stat")).sum === 0L)
    r.foreach { x =>
      assert(x.getAs[String]("f_stat").toDouble >= 0.0)
      assert(x.getAs[Long]("df2") === (x.getAs[Long]("n_blocks") - 1) * 4)
    }
  }

  test("q289_siegel_tukey: groups partition the pool and U is in range") {
    val r = rows("q289_siegel_tukey")
    assert(r.length === 2, "urgent vs low")
    val n = r.map(_.getAs[Long]("n_grp")).sum
    r.foreach { x =>
      val u = x.getAs[Long]("u_stat")
      val na = x.getAs[Long]("n_grp")
      // U ranges over [0, n_a*n_b] up to the odd-n midpoint's +1 slack
      assert(u >= 0L && u <= na * (n - na) + 1,
        s"U out of range: $u for n_a=$na n=$n")
    }
  }

  test("q290_smr_indirect: expectation is rate-consistent and SMR is shared") {
    val r = rows("q290_smr_indirect")
    assert(r.length >= 70, "one stratum row per order month")
    assert(r.map(_.getAs[Long]("smr_bp")).distinct.length === 1,
      "the SMR is a cohort scalar")
    r.foreach { x =>
      assert(x.getAs[Long]("obs_f") <= x.getAs[Long]("n_target"))
      assert(x.getAs[Long]("e_milli") <= x.getAs[Long]("n_target") * 1000L,
        "a stratum's expectation cannot exceed its cohort size")
    }
  }

  test("q291_jonckheere: all ordered pairs present, J is their exact sum") {
    val r = rows("q291_jonckheere")
    assert(r.length === 10, "C(5,2) ordered priority pairs")
    val pairs = r.map(x => (x.getAs[Long]("gi"), x.getAs[Long]("gj"))).toSet
    assert(pairs === (for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)).toSet)
    val j2 = r.map(_.getAs[Long]("j2")).distinct
    assert(j2.length === 1 && j2.head === r.map(_.getAs[Long]("u2_pair")).sum,
      "the shared J statistic must equal the pairwise U mass")
    r.foreach(x => assert(x.getAs[Long]("u2_pair") >= 0L))
  }

  test("q292_page_trend: doubled block ranks satisfy the Friedman identities") {
    val r = rows("q292_page_trend")
    assert(r.length === 5)
    val n = r.map(_.getAs[Long]("n_blocks")).distinct
    assert(n.length === 1, "every treatment sees the same complete blocks")
    // Σ_j R2_j = n·k(k+1): within-block doubled ranks always sum to 30
    assert(r.map(_.getAs[Long]("rank2_sum")).sum === 30L * n.head)
    assert(r.map(x => x.getAs[Long]("score") * x.getAs[Long]("rank2_sum")).sum
      === r.head.getAs[Long]("l2_stat"), "L is the scored rank-sum")
    assert(r.map(_.getAs[Long]("score")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("q293_cuzick_trend: pooled doubled midranks sum to N(N+1)") {
    val r = rows("q293_cuzick_trend")
    assert(r.length === 5)
    val nn = r.map(_.getAs[Long]("n_g")).sum
    assert(r.map(_.getAs[Long]("w2_g")).sum === nn * (nn + 1),
      "Σ_g W2_g must equal the total doubled midrank mass")
    assert(r.map(x => x.getAs[Long]("g") * x.getAs[Long]("w2_g")).sum
      === r.head.getAs[Long]("t2_stat"))
  }

  test("stream_quality_gate: per-source gate panel is conservative and exact") {
    val r = rows("stream_quality_gate")
    assert(r.length === 20, "one panel row per source")
    val nDocs = Tables.documents(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum === nDocs,
      "source panels must partition the streamed corpus")
    r.foreach { x =>
      val nd = x.getAs[Long]("n_docs")
      val nq = x.getAs[Long]("n_pass_quality")
      val na = x.getAs[Long]("n_admitted")
      assert(na <= nq && nq <= nd, "gate chain must be conservative")
      assert(x.getAs[Long]("admit_bp") === na * 10000 / nd)
    }
  }

  test("text_lm_holdout_eval: scores only held-out docs, OOV mass is sane") {
    val r = rows("text_lm_holdout_eval")
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("doc_id") % 5 === 0L, "held-out split only")
      assert(x.getAs[Long]("n_unseen") <= x.getAs[Long]("n_bigrams"))
      assert(x.getAs[String]("avg_nll").toDouble > 0.0,
        "negative log-likelihood is positive")
    }
    // generalization gap: the held-out average nll must exceed the
    // in-corpus text_perplexity average (trained on everything)
    val holdout = r.map(_.getAs[String]("avg_nll").toDouble).sum / r.length
    val inCorpus = rows("text_perplexity")
      .filter(_.getAs[Long]("doc_id") % 5 === 0L)
    val inAvg = inCorpus.map(_.getAs[String]("avg_nll").toDouble).sum / inCorpus.length
    assert(holdout > inAvg,
      s"held-out nll $holdout must exceed in-corpus nll $inAvg")
  }

  test("text_watermark_detect: verdict matches the exact-integer z>4 rule") {
    val r = rows("text_watermark_detect")
    assert(r.length.toLong > 0)
    var suspects = 0
    r.foreach { x =>
      val n = x.getAs[Long]("n_pairs"); val g = x.getAs[Long]("n_green")
      assert(g >= 0L && g <= n)
      val bias = 2 * g - n
      assert(x.getAs[Boolean]("watermark_suspect") ===
        (bias > 0 && bias * bias > 16 * n))
      if (x.getAs[Boolean]("watermark_suspect")) suspects += 1
      assert(math.abs(x.getAs[String]("z").toDouble
        - bias.toDouble / math.sqrt(n.toDouble)) < 1e-6)
    }
    // the corpus is human-shaped word soup: md5 parity is a fair coin,
    // so z > 4 suspects must be a vanishing fraction (p < 4e-5 each)
    assert(suspects <= math.max(1, r.length / 100),
      s"$suspects suspects in unwatermarked text — the null is broken")
  }

  test("stream_tws_bottomk: sample is k-bounded, ordered and count-consistent") {
    val r = rows("stream_tws_bottomk")
    assert(r.length === 5, "one sample row per event type")
    val typeCounts = Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.col("event_type")).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      val k = x.getAs[Int]("k_held")
      val ids = x.getAs[String]("sample_ids").split(",")
      assert(ids.length === k, "sample_ids must hold exactly k_held members")
      assert(ids.distinct.length === k, "sample members are distinct")
      assert(k === math.min(16L, typeCounts(x.getAs[String]("event_type"))).toInt)
      assert(x.getAs[Long]("n_seen") === typeCounts(x.getAs[String]("event_type")),
        "the count witness sees every row of its type")
      assert(x.getAs[Long]("threshold_hash") >= 0L, "60-bit hash is non-negative")
    }
  }

  test("text_crosslingual_overlap: all language pairs, symmetric-consistent shares") {
    val r = rows("text_crosslingual_overlap")
    assert(r.length === 10, "C(5,2) language pairs")
    r.foreach { x =>
      val sh = x.getAs[Long]("n_shared")
      assert(sh <= math.min(x.getAs[Long]("n_a"), x.getAs[Long]("n_b")),
        "shared inventory bounded by the smaller side")
      assert(x.getAs[Long]("share_of_a_bp") <= 10000L)
      assert(x.getAs[Long]("share_of_b_bp") <= 10000L)
      assert(x.getAs[String]("lang_a") < x.getAs[String]("lang_b"))
    }
  }

  test("q294_stuart_maxwell: transition table conserves customers, chi2 shared") {
    val r = rows("q294_stuart_maxwell")
    assert(r.length <= 9 && r.nonEmpty)
    assert(r.map(_.getAs[String]("chi2")).distinct.length === 1,
      "the statistic is a table scalar")
    assert(r.head.getAs[String]("chi2").toDouble >= 0.0,
      "chi-square is nonnegative (V is positive semidefinite)")
    // NTILE terciles: both marginals are balanced within one customer
    val n95 = r.groupBy(_.getAs[Int]("t95")).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    val n96 = r.groupBy(_.getAs[Int]("t96")).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    assert(n95.values.max - n95.values.min <= 1L)
    assert(n96.values.max - n96.values.min <= 1L)
  }

  test("graph_betweenness: dependencies are nonnegative and seeds bound the reach") {
    val r = rows("graph_betweenness")
    assert(r.nonEmpty && r.length <= 20)
    val bc = r.map(_.getAs[Long]("bc_micro"))
    assert(bc.zip(bc.tail).forall { case (a, b) => b <= a },
      "output is ordered by accumulated dependency")
    r.foreach { x =>
      assert(x.getAs[Long]("bc_micro") >= 0L)
      assert(x.getAs[Long]("n_seeds_reaching") >= 1L)
    }
    // a vertex counted once per seed BFS: n_seeds_reaching is bounded
    // by the seed universe (doc_id ≡ 0 mod 10)
    import org.apache.spark.sql.functions._
    val seedBound = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(r.forall(_.getAs[Long]("n_seeds_reaching") <= seedBound))
  }

  test("samp_data_card: per-source datasheet is conservative and complete") {
    val r = rows("samp_data_card")
    assert(r.length === 20, "one card row per source")
    assert(r.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    r.foreach { x =>
      Seq("top_lang_bp", "dup_exposed_bp", "len_ok_bp").foreach { c =>
        val v = x.getAs[Long](c)
        assert(v >= 0L && v <= 10000L, s"$c out of basis-point range: $v")
      }
      assert(x.getAs[Long]("top_lang_bp") >= 10000L / 5,
        "the dominant language can never sit below the uniform share")
      assert(x.getAs[Long]("n_tokens") >= x.getAs[Long]("n_docs"),
        "every document has at least one token")
      assert(Set("en", "de", "es", "fr", "zh")(x.getAs[String]("top_lang")))
    }
  }

  test("sim_embedding_drift: one row per label, cosine in range, counts conserved") {
    val r = rows("sim_embedding_drift")
    assert(r.length === 10, "one drift row per label")
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(r.map(x => x.getAs[Long]("n_a") + x.getAs[Long]("n_b")).sum === nVecs,
      "snapshot halves must partition the corpus")
    r.foreach { x =>
      val c = x.getAs[Long]("cos_micro")
      // integer-quantized cosine of two real vectors; floor rounding
      // can push the magnitude a hair past 1e6, never past 1001000
      assert(c >= -1001000L && c <= 1001000L, s"cos_micro out of range: $c")
      assert(x.getAs[Long]("norm_a_milli") >= 1L)
      assert(x.getAs[Long]("norm_b_milli") >= 1L)
      assert(x.getAs[Boolean]("drifted") === (c < 990000L))
    }
  }
}
