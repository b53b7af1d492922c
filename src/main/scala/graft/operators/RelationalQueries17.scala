package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.OracleParity._

/** Round-14 day-series estimators:
  *
  *  - `q242_isotonic_pav` — isotonic (monotone non-decreasing)
  *    regression of daily revenue on time, computed EXACTLY via the
  *    closed-form minimax identity fitted_i = max_{j≤i} min_{k≥i}
  *    mean(y_j..y_k) — the same fit pool-adjacent-violators reaches,
  *    but with no sequential algorithm anywhere: two window passes
  *    over the day-pair frame replace the PAV loop, so the "fit" is
  *    pure relational algebra (the monotone trend floor under a noisy
  *    intake series; also the calibration step of isotonic-calibrated
  *    classifiers).
  *  - `q243_sprt_ab`      — Wald's sequential probability ratio test
  *    on the daily urgent-order fraction: H0 p=0.18 vs H1 p=0.22 at
  *    α = β = 0.05, LLR accumulated day by day, decision = which
  *    boundary the cumulative LLR crosses first (the sequential
  *    monitor that stops a drift test early instead of waiting for a
  *    fixed-horizon z-test like q100).
  *
  * Exactness: both queries carry NO query-time libm at all. The
  * isotonic means are doubles of exact BIGINT prefix-sum differences
  * (cents; exact below 2^53 ≈ $90T total revenue) and min/max only
  * SELECT among deterministic doubles. The SPRT per-trial log terms
  * ln(p1/p0), ln((1−p1)/(1−p0)) and the ln((1−β)/α) boundaries are
  * Scala-precomputed micro-quantized LITERALS inlined into both
  * engines' SQL (the q241 periodogram discipline), so every daily LLR
  * k·La + (n−k)·Lb and its cumulative sum is exact BIGINT arithmetic.
  *
  * Scale: one keyed day-aggregate each (partial+final over the corpus
  * scan), then day-sized everything after. The isotonic pair frame is
  * calendar² ≈ 2.9M rows — a broadcast theta self-join of two
  * day-sized frames whose size depends on the CALENDAR, not the
  * corpus: at 100× volume the pair frame is unchanged while the day
  * aggregate absorbs the growth map-side. SPRT cumulative sums ride
  * the established day-sized global window idiom.
  */
object RelationalQueries17 {
  type Q = (SparkSession, String) => DataFrame

  private val D19 = DecimalType(19, 0)

  /** q248 decay factors (1−λ)^{2t} = 0.64^t for t = 1..89 as EXACT
    * double literals (17 sig digits round-trips bit-exactly through
    * both engines' parsers); beyond t = 89 the factor is below half an
    * ulp of 1.0, so 1−decay evaluates to exactly 1.0 either way. A
    * Scala-precomputed literal table instead of a per-row fold — the
    * q241 trig discipline — because a multiplicative HOF fold was
    * measured to drift 1 ulp between Spark's codegen'd aggregate and
    * DuckDB's list_reduce. */
  private val DecayCase: String = {
    val ds = Iterator.iterate(1.0)(_ * 0.64).drop(1).take(89).toSeq
    ds.zipWithIndex.map { case (v, i) =>
      f"WHEN t = ${i + 1} THEN CAST(${"%.17e".format(v)} AS DOUBLE)" }
      .mkString("(CASE ", " ", " ELSE CAST(0.0 AS DOUBLE) END)")
  }

  /** SPRT design constants (fixed literals shared with the oracle). */
  private val P0 = 0.18
  private val P1 = 0.22
  /** ln(p1/p0) and ln((1−p1)/(1−p0)) in micro-nats (floor-quantized
    * once in Scala — no libm in either engine at query time). */
  private val LaMicro = math.floor(math.log(P1 / P0) * 1e6).toLong
  private val LbMicro = math.floor(math.log((1 - P1) / (1 - P0)) * 1e6).toLong
  /** Boundaries ln((1−β)/α) = ln 19 and ln(β/(1−α)) = −ln 19 (α=β=.05). */
  private val AMicro = math.floor(math.log(0.95 / 0.05) * 1e6).toLong
  private val BMicro = math.floor(math.log(0.05 / 0.95) * 1e6).toLong

  val queries: Map[String, Q] = Map(
    // ISOTONIC REGRESSION by minimax: day frame → prefix sums →
    // all (j ≤ k) window means → B(j,k) = min_{k'≥k} mean(j..k')
    // (one window min per j, descending k) → fitted_k = max_{j≤k}
    // B(j,k) (one keyed aggregate). Fitted values floor to cents.
    "q242_isotonic_pav" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum((dec($"o_totalprice") * 100).cast("long")).as("v"))
      val idx = day
        .withColumn("t", row_number().over(Window.orderBy($"day")).cast("long"))
        .withColumn("spre", sum($"v").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"t", $"day", $"v", $"spre")
        .localCheckpoint() // day-sized; feeds both sides of the pair join
      val jf = idx.select($"t".as("j"), ($"spre" - $"v").as("sj1"))
      val kf = idx.select($"t".as("k"), $"spre".as("sk"))
      val pairs = jf.join(broadcast(kf), $"j" <= $"k")
        .withColumn("mean_jk",
          ($"sk" - $"sj1").cast("double") / ($"k" - $"j" + 1L).cast("double"))
      val bmin = pairs.withColumn("bjk",
        min($"mean_jk").over(Window.partitionBy($"j").orderBy($"k".desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val fitted = bmin.groupBy($"k").agg(max($"bjk").as("fit"))
      idx.join(fitted, $"t" === $"k")
        .selectExpr("date_format(day, 'yyyy-MM-dd') AS day", "v AS v_cents",
          "CAST(FLOOR(fit) AS BIGINT) AS fitted_cents")
        .orderBy($"day")
    }),

    // SPRT: daily (n, k) → exact-integer LLR → cumulative sum →
    // first boundary crossing under the (day) total order.
    "q243_sprt_ab" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L)).as("k"))
      val cum = day
        .withColumn("llr", $"k" * LaMicro + ($"n" - $"k") * LbMicro)
        .withColumn("cum", sum($"llr").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint() // day-sized
      val stats = cum.agg(count(lit(1)).as("n_days"),
        sum($"llr").as("llr_final_micro"),
        min($"cum").as("llr_min_micro"), max($"cum").as("llr_max_micro"))
      val crossings = cum.agg(
        min(when($"cum" >= AMicro, $"day")).as("d1"),
        min(when($"cum" <= BMicro, $"day")).as("d0"))
      stats.crossJoin(broadcast(crossings)).selectExpr(
        "n_days",
        """CASE WHEN d1 IS NULL AND d0 IS NULL THEN 'continue'
          | WHEN d0 IS NULL OR (d1 IS NOT NULL AND d1 <= d0) THEN 'h1'
          | ELSE 'h0' END AS decision""".stripMargin,
        """COALESCE(date_format(
          |  CASE WHEN d1 IS NULL THEN d0 WHEN d0 IS NULL THEN d1
          |       WHEN d1 <= d0 THEN d1 ELSE d0 END, 'yyyy-MM-dd'),
          | 'none') AS first_cross_day""".stripMargin,
        "llr_final_micro", "llr_min_micro", "llr_max_micro")
    }),

    // SHAPLEY CHANNEL ATTRIBUTION, EXACT: each converter's coalition is
    // the bitmask of channels touched strictly before their FIRST
    // purchase; the value function v(S) = # converters whose coalition
    // ⊆ S (monotone, so every marginal v(S∪c) − v(S) is a non-negative
    // integer), and φ_c·n! = Σ_{S∌c} |S|!(n−1−|S|)!·[v(S∪c) − v(S)]
    // is EXACT BIGINT arithmetic — the factorial weights are literals
    // on the 16-row coalition frame (n = 4 channels). The principled
    // multi-touch credit q94_last_touch_attribution approximates.
    // One corpus scan builds the per-user coalition (keyed aggregate);
    // everything after is 16×16-sized.
    "q244_shapley_attribution" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d).select($"user_id", $"event_type", $"ts")
      val firstp = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id").agg(min($"ts").as("fp"))
      val masks = ev.join(broadcast(firstp), Seq("user_id"))
        .filter($"ts" < $"fp" && $"event_type" =!= "purchase")
        .select($"user_id", $"event_type").distinct()
        .selectExpr("user_id", s"$ChannelBitSql AS bit")
        .groupBy($"user_id").agg(sum($"bit").cast("long").as("mask"))
      val setc = firstp.join(masks, Seq("user_id"), "left")
        .selectExpr("COALESCE(mask, 0) AS mask")
        .groupBy($"mask").agg(count(lit(1)).as("conv"))
        .localCheckpoint() // ≤16 rows; feeds two v() lookups
      val coal = CoalitionRows.toDF("m", "w") // (mask, |S|!(n−1−|S|)!)
      val v = coal.select($"m")
        .join(broadcast(setc), expr("(mask & m) = mask"), "left")
        .groupBy($"m").agg(coalesce(sum($"conv"), lit(0L)).as("vm"))
      val ch = ChannelRows.toDF("channel", "bit")
      ch.crossJoin(broadcast(coal)).filter(expr("(m & bit) = 0"))
        .join(broadcast(v.select($"m", $"vm")), Seq("m"))
        .join(broadcast(v.select($"m".as("mc"), $"vm".as("vmc"))),
          expr("mc = (m | bit)"))
        .groupBy($"channel")
        .agg(sum($"w" * ($"vmc" - $"vm")).cast("long").as("phi_num"))
        .selectExpr("channel", "phi_num",
          "phi_num * 1000 DIV 24 AS phi_milli") // n! = 24; marginals ≥ 0
        .orderBy($"channel")
    }),

    // TWO-SAMPLE ANDERSON–DARLING (tie-weighted Pettitt form): where
    // q228's Cramér–von Mises weights all of [0,1] equally, AD weights
    // the ECDF gap by 1/(H(N−H)) — tail-sensitive distribution-shift
    // detection. Per distinct value: t = c·(N·B − n1·H)²/(H(N−H)n1n2),
    // every operand an exact BIGINT off the same cumulative substrate
    // as q228, per-point micro-quantized BEFORE the sum. The last
    // pooled point (H = N) is excluded by definition (its weight is a
    // 0/0). Asymptotic 5% point 2.492 as a fixed literal.
    "q245_anderson_darling" -> ((s, d) => {
      import s.implicits._
      val perv = lineitem(s, d)
        .groupBy((dec($"l_discount") * 100).cast("long").as("disc"))
        .agg(sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("c1"),
          sum(when($"l_returnflag" =!= "R", 1L).otherwise(0L)).as("c2"))
      val wc = Window.orderBy($"disc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perv
        .withColumn("b", sum($"c1").over(wc))
        .withColumn("h", sum($"c1" + $"c2").over(wc))
      val tot = cum.agg(max($"b").as("n1"), max($"h").as("nn"))
      cum.crossJoin(broadcast(tot))
        .filter($"h" < $"nn")
        .selectExpr("n1", "nn",
          """CAST(FLOOR(
            |  (CAST(nn AS DOUBLE) * CAST(b AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(h AS DOUBLE))
            |  * (CAST(nn AS DOUBLE) * CAST(b AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(h AS DOUBLE))
            |  / (CAST(h AS DOUBLE) * CAST(nn - h AS DOUBLE))
            |  / (CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE))
            |  * CAST(c1 + c2 AS DOUBLE) * 1e6) AS BIGINT) AS t_micro""".stripMargin)
        .groupBy($"n1", $"nn")
        .agg(sum($"t_micro").cast("long").as("a2_micro"),
          count(lit(1)).as("n_points"))
        .selectExpr("n1", "nn - n1 AS n2", "n_points", "a2_micro",
          "a2_micro >= 2492000 AS significant")
    }),

    // KPSS LEVEL-STATIONARITY TEST on daily order counts — the
    // complement of q239's Dickey–Fuller (DF: H0 = unit root; KPSS:
    // H0 = stationary; agreement of the pair is the real diagnostic).
    // With centered exact integers a_t = n·y_t − Σy and their prefix
    // sums S_t, η = ΣS_t²/(n·Σa_t²) exactly (the n-scalings cancel);
    // both quadratic sums ride DECIMAL(19)² products. 5% critical
    // 0.463 as a fixed literal.
    "q246_kpss_level" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("y"))
      val tot = day.agg(count(lit(1)).as("nd"), sum($"y").as("sy"))
      val a = day.crossJoin(broadcast(tot))
        .select($"day", ($"nd" * $"y" - $"sy").cast("long").as("a"), $"nd")
      val wc = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.withColumn("sa", sum($"a").over(wc))
        .groupBy()
        .agg(max($"nd").as("n_days"),
          sum($"sa".cast(D19) * $"sa".cast(D19)).as("ssq"),
          sum($"a".cast(D19) * $"a".cast(D19)).as("saa"))
        .selectExpr("n_days",
          """CASE WHEN saa = 0 THEN CAST(0 AS BIGINT)
            | ELSE CAST(FLOOR(CAST(ssq AS DOUBLE)
            |  / (CAST(n_days AS DOUBLE) * CAST(saa AS DOUBLE)) * 1e6) AS BIGINT)
            | END AS eta_micro""".stripMargin)
        .selectExpr("n_days", "eta_micro", "eta_micro >= 463000 AS nonstationary")
    }),

    // BINARY-SEGMENTATION CHANGEPOINT SEARCH on daily revenue — where
    // q170 TESTS a given break and q127/q154/q234 monitor drift, this
    // FINDS the two strongest level shifts: round 1 picks the split
    // maximizing the SSE gain S_L²/n_L + S_R²/n_R − S²/n over all
    // calendar positions (prefix sums make every candidate O(1)),
    // round 2 re-runs the search inside both segments and keeps the
    // globally best second split (classic binseg order). Gains are
    // doubles of exact cents sums (the ml_decision_tree contract),
    // reported normalized by n (cents²/day; exact-BIGINT-rendered).
    "q247_binseg_changepoints" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum((dec($"o_totalprice") * 100).cast("long")).as("v"))
      val idx = day
        .withColumn("t", row_number().over(Window.orderBy($"day")).cast("long"))
        .withColumn("sp", sum($"v").over(Window.orderBy($"day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .localCheckpoint() // day-sized
      val tot = idx.agg(max($"t").as("n"), max($"sp").as("stot"))
        .localCheckpoint()
      val cand1 = idx.crossJoin(broadcast(tot)).filter($"t" < $"n")
        .withColumn("gain", expr(
          """(CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(t AS DOUBLE)
            | + CAST(stot - sp AS DOUBLE) * CAST(stot - sp AS DOUBLE) / CAST(n - t AS DOUBLE)
            | - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n AS DOUBLE))""".stripMargin))
      val cp1 = cand1.orderBy($"gain".desc, $"t".asc).limit(1)
        .selectExpr("t AS t1", "sp AS sp1", "n", "stot",
          "date_format(day, 'yyyy-MM-dd') AS cp1_day",
          "CAST(FLOOR(gain / CAST(n AS DOUBLE)) AS BIGINT) AS g1_norm",
          "sp DIV t AS mean1_l_cents",
          "(stot - sp) DIV (n - t) AS mean1_r_cents")
        .localCheckpoint() // 1-row model state
      // two segments (lo, hi] with their boundary prefix sums
      val segs = cp1.selectExpr(
        """stack(2, CAST(0 AS BIGINT), t1, CAST(0 AS BIGINT), sp1, 'L',
          | t1, n, sp1, stot, 'R') AS (lo, hi, slo, shi, side)""".stripMargin)
      val cand2 = idx.join(broadcast(segs), $"t" > $"lo" && $"t" < $"hi")
        .withColumn("gain", expr(
          """(CAST(sp - slo AS DOUBLE) * CAST(sp - slo AS DOUBLE) / CAST(t - lo AS DOUBLE)
            | + CAST(shi - sp AS DOUBLE) * CAST(shi - sp AS DOUBLE) / CAST(hi - t AS DOUBLE)
            | - CAST(shi - slo AS DOUBLE) * CAST(shi - slo AS DOUBLE) / CAST(hi - lo AS DOUBLE))""".stripMargin))
      val cp2 = cand2.orderBy($"gain".desc, $"t".asc).limit(1)
        .selectExpr("date_format(day, 'yyyy-MM-dd') AS cp2_day", "side AS cp2_side",
          "CAST(FLOOR(gain / CAST(hi - lo AS DOUBLE)) AS BIGINT) AS g2_norm")
      cp1.selectExpr("n AS n_days", "cp1_day", "mean1_l_cents", "mean1_r_cents", "g1_norm")
        .crossJoin(broadcast(cp2))
    }),

    // EWMA CONTROL CHART (λ=0.2, L=3) on daily revenue — the
    // small-shift-sensitive SPC member between q151's XmR (big shifts)
    // and q195's p-chart (rates): z_t = λx_t + (1−λ)z_{t−1} seeded at
    // x̄, limits x̄ ± 3σ√(λ/(2−λ)·(1−(1−λ)^{2t})). With λ = 1/5 the z
    // recursion is run ENTIRELY IN INTEGERS: z'_milli = ⌊(4·z_milli +
    // 1000·x)/5⌋ — floor-quantized to milli-cents at every step, so
    // the 2400-step prefix fold is bit-free of float drift (a plain
    // double fold of this length measurably diverges by 1 ulp between
    // Spark's codegen'd HOF and DuckDB's list_reduce — caught by the
    // gate and designed out, not papered over). The decay factor
    // (1−λ)^{2t} and σ ride one single-evaluation double tree each.
    "q248_ewma_chart" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum((dec($"o_totalprice") * 100).cast("long")).as("v"))
      val tot = day.agg(count(lit(1)).as("nd"), sum($"v").as("sv"))
      // deviations kilo-cent-quantized BEFORE squaring: the quadratic
      // sum then stays < 2^53, so its BIGINT→DOUBLE cast is EXACT on
      // both engines — a DECIMAL(38) Σa² cast to double diverged by
      // 1 ulp between the engines at sf ≥ 0.01 (the q170 class) and
      // surfaced in the printf'd limits. Width: exact through ~9e4
      // daily kilo-cent deviations² × calendar (≈ sf 15); beyond,
      // re-coarsen the quantum (q188 discipline).
      val a = day.crossJoin(broadcast(tot))
        .selectExpr("day", "v", "nd", "sv",
          """CAST(FLOOR(CAST(v - sv DIV nd AS DOUBLE) / 1000.0) AS BIGINT)
            | AS devk""".stripMargin)
      val sd = a.agg(sum($"devk" * $"devk").cast("long").as("m2k"))
      val wc = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      a.crossJoin(broadcast(sd))
        .withColumn("vals", collect_list($"v").over(wc))
        .selectExpr("day", "v", "CAST(size(vals) AS BIGINT) AS t",
          "(1000 * sv) DIV nd AS mu_milli",
          "CAST(sv AS DOUBLE) / CAST(nd AS DOUBLE) AS mu",
          // sample σ in cents from the exact kilo-cent quadratic sum
          """sqrt(CAST(m2k AS DOUBLE) / CAST(nd - 1 AS DOUBLE))
            | * 1000.0D AS sigma""".stripMargin,
          """aggregate(vals, (1000 * sv) DIV nd,
            | (acc, x) -> (4 * acc + 1000 * x) DIV 5) AS z_milli""".stripMargin)
        .selectExpr("day", "v", "t", "mu_milli", "mu", "z_milli",
          s"3.0D * sigma * sqrt(0.2D / 1.8D * (1.0D - $DecayCase)) AS hw")
        .selectExpr("date_format(day, 'yyyy-MM-dd') AS day", "v AS v_cents", "t",
          "z_milli",
          "format_string('%.6e', mu + hw) AS ucl",
          "format_string('%.6e', mu - hw) AS lcl",
          "CAST(abs(z_milli - mu_milli) AS DOUBLE) / 1000.0D > hw AS ooc")
        .orderBy($"day")
    }),

    // SEASONAL GENERALIZED-ESD: 3 iterative Grubbs rounds over
    // WEEKDAY-deseasonalized daily revenue — q238 flags one outlier
    // and stops; masked second/third outliers (which inflate the SD
    // the single test divides by) need the remove-and-retest rounds,
    // and deseasonalizing first keeps ordinary weekend dips from
    // soaking up the budget. Residuals are milli-floored per row
    // (exact BIGINTs); each round's G = max|a|/√(Σa²/(n−1)) rides the
    // q238 centered-integer machinery on the day-sized remaining set,
    // argmax under the (|a| desc, day) total order, then the day is
    // removed. 3 pointer-checkpointed rounds, unrolled-CTE oracle.
    "q249_seasonal_esd" -> ((s, d) => {
      import s.implicits._
      val day = orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(sum((dec($"o_totalprice") * 100).cast("long")).as("v"))
        .withColumn("w", dayofweek($"day"))
      val wk = day.groupBy($"w")
        .agg(count(lit(1)).as("nw"), sum($"v").as("sw"))
      var rem = day.join(broadcast(wk), Seq("w"))
        .selectExpr("day",
          """CAST(FLOOR((CAST(v AS DOUBLE)
            | - CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE)) * 1000.0) AS BIGINT) AS r""".stripMargin)
        .localCheckpoint() // day-sized residual frame
      val out = Seq.newBuilder[org.apache.spark.sql.DataFrame]
      for (i <- 1 to 3) {
        val tot = rem.agg(count(lit(1)).as("n"), sum($"r").as("sr"),
          sum($"r".cast(D19) * $"r".cast(D19)).as("srr"))
        val dev = rem.crossJoin(broadcast(tot))
          .select($"day", $"r", $"n", $"sr", $"srr",
            ($"n" * $"r" - $"sr").cast("long").as("a"))
        val pick = dev.orderBy(abs($"a").desc, $"day".asc).limit(1)
          .selectExpr(s"$i AS round", "date_format(day, 'yyyy-MM-dd') AS outlier_day",
            "n AS n_tested",
            // G = max|a| / √((n·Σr² − (Σr)²)·n/(n−1)) over exact sums
            """CAST(FLOOR(CAST(abs(a) AS DOUBLE)
              | / sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
              |         - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
              |        * CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE))
              | * 1000.0) AS BIGINT) AS g_milli""".stripMargin,
            "day AS pick_day")
          .localCheckpoint() // 1-row round state
        out += pick.drop("pick_day")
        rem = rem.join(broadcast(pick.select($"pick_day".as("day"))),
          Seq("day"), "left_anti").localCheckpoint()
      }
      out.result().reduce(_ unionByName _).orderBy($"round")
    })
  )

  /** Channel → bit assignment (the 4 non-purchase event types). */
  private val ChannelBitSql =
    """CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      | WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END""".stripMargin

  /** All 16 coalitions of the 4 channels with Shapley weights
    * w = |S|!·(n−1−|S|)! (n = 4): 6, 2, 2, 6 by popcount. */
  private val CoalitionRows: Seq[(Long, Long)] = (0 until 16).map { m =>
    val k = java.lang.Integer.bitCount(m)
    val fact = Array(1L, 1L, 2L, 6L, 24L)
    // the |S| = 4 coalition never appears as a "without c" base (the
    // (m & bit) = 0 filter excludes it) — its weight is inert
    (m.toLong, if (k <= 3) fact(k) * fact(3 - k) else 0L)
  }

  private val ChannelRows: Seq[(String, Long)] =
    Seq(("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L))

  /** Shared VALUES text for the coalition/channel frames (oracle). */
  private val CoalitionSql = CoalitionRows
    .map { case (m, w) => s"($m, $w)" }
    .mkString("(VALUES ", ", ", ") coal(m, w)")
  private val ChannelSql = ChannelRows
    .map { case (c, b) => s"('$c', $b)" }
    .mkString("(VALUES ", ", ", ") ch(channel, bit)")

  val oracles: Map[String, String] = Map(
    "q242_isotonic_pav" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |idx AS (
        |  SELECT day, v,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(SUM(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS spre
        |  FROM day),
        |pairs AS (
        |  SELECT j.t AS j, k.t AS k,
        |    CAST(k.spre - j.spre + j.v AS DOUBLE)
        |      / CAST(k.t - j.t + 1 AS DOUBLE) AS mean_jk
        |  FROM idx j JOIN idx k ON j.t <= k.t),
        |bmin AS (
        |  SELECT j, k,
        |    MIN(mean_jk) OVER (PARTITION BY j ORDER BY k DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bjk
        |  FROM pairs),
        |fitted AS (SELECT k, MAX(bjk) AS fit FROM bmin GROUP BY k)
        |SELECT strftime(i.day, '%Y-%m-%d') AS day, i.v AS v_cents,
        |  CAST(FLOOR(f.fit) AS BIGINT) AS fitted_cents
        |FROM idx i JOIN fitted f ON f.k = i.t
        |ORDER BY day""".stripMargin,

    "q243_sprt_ab" ->
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM orders GROUP BY 1),
         |cum AS (
         |  SELECT day, k * $LaMicro + (n - k) * $LbMicro AS llr,
         |    CAST(SUM(k * $LaMicro + (n - k) * $LbMicro) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM day),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(SUM(llr) AS BIGINT) AS llr_final_micro,
         |    CAST(MIN(cum) AS BIGINT) AS llr_min_micro,
         |    CAST(MAX(cum) AS BIGINT) AS llr_max_micro
         |  FROM cum),
         |crossings AS (
         |  SELECT MIN(CASE WHEN cum >= $AMicro THEN day END) AS d1,
         |    MIN(CASE WHEN cum <= $BMicro THEN day END) AS d0
         |  FROM cum)
         |SELECT n_days,
         |  CASE WHEN d1 IS NULL AND d0 IS NULL THEN 'continue'
         |   WHEN d0 IS NULL OR (d1 IS NOT NULL AND d1 <= d0) THEN 'h1'
         |   ELSE 'h0' END AS decision,
         |  COALESCE(strftime(
         |    CASE WHEN d1 IS NULL THEN d0 WHEN d0 IS NULL THEN d1
         |         WHEN d1 <= d0 THEN d1 ELSE d0 END, '%Y-%m-%d'),
         |   'none') AS first_cross_day,
         |  llr_final_micro, llr_min_micro, llr_max_micro
         |FROM stats CROSS JOIN crossings""".stripMargin,

    "q244_shapley_attribution" ->
      s"""WITH firstp AS (
         |  SELECT user_id, MIN(ts) AS fp FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |touched AS (
         |  SELECT DISTINCT e.user_id, e.event_type
         |  FROM events e JOIN firstp f ON f.user_id = e.user_id
         |  WHERE e.ts < f.fp AND e.event_type <> 'purchase'),
         |masks AS (
         |  SELECT user_id,
         |    CAST(SUM($ChannelBitSql) AS BIGINT) AS mask
         |  FROM touched GROUP BY user_id),
         |setc AS (
         |  SELECT COALESCE(m.mask, 0) AS mask, CAST(count(*) AS BIGINT) AS conv
         |  FROM firstp f LEFT JOIN masks m ON m.user_id = f.user_id
         |  GROUP BY COALESCE(m.mask, 0)),
         |v AS (
         |  SELECT coal.m, CAST(COALESCE(SUM(s.conv), 0) AS BIGINT) AS vm
         |  FROM $CoalitionSql
         |  LEFT JOIN setc s ON (s.mask & coal.m) = s.mask
         |  GROUP BY coal.m)
         |SELECT ch.channel,
         |  CAST(SUM(coal.w * (vc.vm - vb.vm)) AS BIGINT) AS phi_num,
         |  CAST(SUM(coal.w * (vc.vm - vb.vm)) AS BIGINT) * 1000 // 24 AS phi_milli
         |FROM $ChannelSql
         |JOIN $CoalitionSql ON (coal.m & ch.bit) = 0
         |JOIN v vb ON vb.m = coal.m
         |JOIN v vc ON vc.m = (coal.m | ch.bit)
         |GROUP BY ch.channel
         |ORDER BY ch.channel""".stripMargin,

    "q245_anderson_darling" ->
      """WITH perv AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT disc, c1, c2,
        |    CAST(SUM(c1) OVER (ORDER BY disc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS b,
        |    CAST(SUM(c1 + c2) OVER (ORDER BY disc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS h
        |  FROM perv),
        |tot AS (SELECT MAX(b) AS n1, MAX(h) AS nn FROM cum),
        |terms AS (
        |  SELECT n1, nn,
        |    CAST(FLOOR(
        |      (CAST(nn AS DOUBLE) * CAST(b AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(h AS DOUBLE))
        |      * (CAST(nn AS DOUBLE) * CAST(b AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(h AS DOUBLE))
        |      / (CAST(h AS DOUBLE) * CAST(nn - h AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE))
        |      * CAST(c1 + c2 AS DOUBLE) * 1e6) AS BIGINT) AS t_micro
        |  FROM cum CROSS JOIN tot
        |  WHERE h < nn)
        |SELECT n1, nn - n1 AS n2,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(SUM(t_micro) AS BIGINT) AS a2_micro,
        |  CAST(SUM(t_micro) AS BIGINT) >= 2492000 AS significant
        |FROM terms GROUP BY n1, nn""".stripMargin,

    "q246_kpss_level" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(SUM(y) AS BIGINT) AS sy FROM day),
        |a AS (
        |  SELECT day, CAST(nd * y - sy AS BIGINT) AS a, nd
        |  FROM day CROSS JOIN tot),
        |sa AS (
        |  SELECT a, nd,
        |    CAST(SUM(a) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sa
        |  FROM a),
        |sums AS (
        |  SELECT MAX(nd) AS n_days,
        |    CAST(SUM(CAST(sa AS DECIMAL(19,0)) * CAST(sa AS DECIMAL(19,0))) AS DOUBLE) AS ssq,
        |    CAST(SUM(CAST(a AS DECIMAL(19,0)) * CAST(a AS DECIMAL(19,0))) AS DOUBLE) AS saa
        |  FROM sa)
        |SELECT n_days,
        |  CASE WHEN saa = 0 THEN CAST(0 AS BIGINT)
        |   ELSE CAST(FLOOR(ssq / (CAST(n_days AS DOUBLE) * saa) * 1e6) AS BIGINT)
        |   END AS eta_micro,
        |  CASE WHEN saa = 0 THEN CAST(0 AS BIGINT)
        |   ELSE CAST(FLOOR(ssq / (CAST(n_days AS DOUBLE) * saa) * 1e6) AS BIGINT)
        |   END >= 463000 AS nonstationary
        |FROM sums""".stripMargin,

    "q247_binseg_changepoints" ->
      """WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |idx AS (
        |  SELECT day, v,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
        |    CAST(SUM(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sp
        |  FROM day),
        |tot AS (SELECT MAX(t) AS n, MAX(sp) AS stot FROM idx),
        |cand1 AS (
        |  SELECT i.*, tot.n, tot.stot,
        |    CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(t AS DOUBLE)
        |     + CAST(stot - sp AS DOUBLE) * CAST(stot - sp AS DOUBLE) / CAST(n - t AS DOUBLE)
        |     - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n AS DOUBLE) AS gain
        |  FROM idx i CROSS JOIN tot WHERE t < n),
        |cp1 AS (
        |  SELECT t AS t1, sp AS sp1, n, stot,
        |    strftime(day, '%Y-%m-%d') AS cp1_day,
        |    CAST(FLOOR(gain / CAST(n AS DOUBLE)) AS BIGINT) AS g1_norm,
        |    sp // t AS mean1_l_cents,
        |    (stot - sp) // (n - t) AS mean1_r_cents
        |  FROM cand1 ORDER BY gain DESC, t ASC LIMIT 1),
        |segs AS (
        |  SELECT CAST(0 AS BIGINT) AS lo, t1 AS hi, CAST(0 AS BIGINT) AS slo,
        |    sp1 AS shi, 'L' AS side FROM cp1
        |  UNION ALL
        |  SELECT t1, n, sp1, stot, 'R' FROM cp1),
        |cand2 AS (
        |  SELECT i.day, i.t, s.lo, s.hi, s.side,
        |    CAST(i.sp - s.slo AS DOUBLE) * CAST(i.sp - s.slo AS DOUBLE) / CAST(i.t - s.lo AS DOUBLE)
        |     + CAST(s.shi - i.sp AS DOUBLE) * CAST(s.shi - i.sp AS DOUBLE) / CAST(s.hi - i.t AS DOUBLE)
        |     - CAST(s.shi - s.slo AS DOUBLE) * CAST(s.shi - s.slo AS DOUBLE) / CAST(s.hi - s.lo AS DOUBLE) AS gain
        |  FROM idx i JOIN segs s ON i.t > s.lo AND i.t < s.hi),
        |cp2 AS (
        |  SELECT strftime(day, '%Y-%m-%d') AS cp2_day, side AS cp2_side,
        |    CAST(FLOOR(gain / CAST(hi - lo AS DOUBLE)) AS BIGINT) AS g2_norm
        |  FROM cand2 ORDER BY gain DESC, t ASC LIMIT 1)
        |SELECT n AS n_days, cp1_day, mean1_l_cents, mean1_r_cents, g1_norm,
        |  cp2_day, cp2_side, g2_norm
        |FROM cp1 CROSS JOIN cp2""".stripMargin,

    "q248_ewma_chart" ->
      s"""WITH day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd, CAST(SUM(v) AS BIGINT) AS sv FROM day),
        |av AS (
        |  SELECT day, v, nd, sv,
        |    CAST(FLOOR(CAST(v - sv // nd AS DOUBLE) / 1000.0) AS BIGINT) AS devk
        |  FROM day CROSS JOIN tot),
        |sd AS (
        |  SELECT CAST(SUM(devk * devk) AS BIGINT) AS m2k
        |  FROM av),
        |w AS (
        |  SELECT day, v, nd, sv,
        |    list(v) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vals
        |  FROM av),
        |n1 AS (
        |  SELECT day, v, CAST(len(vals) AS BIGINT) AS t,
        |    (1000 * sv) // nd AS mu_milli,
        |    CAST(sv AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
        |    sqrt(CAST(m2k AS DOUBLE) / CAST(nd - 1 AS DOUBLE)) * 1000.0 AS sigma,
        |    CAST(list_reduce(list_prepend((1000 * sv) // nd, vals),
        |      (acc, x) -> (4 * acc + 1000 * x) // 5) AS BIGINT) AS z_milli
        |  FROM w CROSS JOIN sd),
        |n2 AS (
        |  SELECT day, v, t, mu_milli, mu, z_milli,
        |    3.0 * sigma * sqrt(0.2 / 1.8 * (1.0 - $DecayCase)) AS hw
        |  FROM n1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, v AS v_cents, t,
        |  z_milli,
        |  printf('%.6e', mu + hw) AS ucl,
        |  printf('%.6e', mu - hw) AS lcl,
        |  CAST(abs(z_milli - mu_milli) AS DOUBLE) / 1000.0 > hw AS ooc
        |FROM n2 ORDER BY day""".stripMargin,

    "q249_seasonal_esd" -> {
      def round(i: Int): String = {
        val prev = s"rem${i - 1}"
        s"""tot$i AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS sr,
           |    SUM(CAST(r AS DECIMAL(19,0)) * CAST(r AS DECIMAL(19,0))) AS srr
           |  FROM $prev),
           |pick$i AS MATERIALIZED (
           |  SELECT $i AS round, strftime(day, '%Y-%m-%d') AS outlier_day,
           |    n AS n_tested,
           |    CAST(FLOOR(CAST(abs(n * r - sr) AS DOUBLE)
           |      / sqrt((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
           |              - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
           |             * CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE))
           |      * 1000.0) AS BIGINT) AS g_milli,
           |    day AS pick_day
           |  FROM $prev CROSS JOIN tot$i
           |  ORDER BY abs(n * r - sr) DESC, day ASC LIMIT 1),
           |rem$i AS MATERIALIZED (
           |  SELECT day, r FROM $prev
           |  WHERE day NOT IN (SELECT pick_day FROM pick$i))""".stripMargin
      }
      s"""WITH day AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |dw AS (SELECT day, v, dayofweek(day) AS w FROM day),
         |wk AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS nw, CAST(SUM(v) AS BIGINT) AS sw
         |  FROM dw GROUP BY w),
         |rem0 AS MATERIALIZED (
         |  SELECT d.day,
         |    CAST(FLOOR((CAST(v AS DOUBLE)
         |      - CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE)) * 1000.0) AS BIGINT) AS r
         |  FROM dw d JOIN wk ON wk.w = d.w),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT round, outlier_day, n_tested, g_milli FROM pick1
         |UNION ALL SELECT round, outlier_day, n_tested, g_milli FROM pick2
         |UNION ALL SELECT round, outlier_day, n_tested, g_milli FROM pick3
         |ORDER BY round""".stripMargin
    }
  )
}
