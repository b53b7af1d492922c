package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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
         |ORDER BY ch.channel""".stripMargin
  )
}
