package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.OracleParity._

/** Round-7 additions: recursive CTE (iterative plans inside one SQL
  * statement), linear-regression aggregates pinned against exact
  * arithmetic, and URL parsing/encoding — three operator families a
  * warehouse user expects that the suite didn't yet exercise.
  */
object RelationalQueries4 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Recursive CTE: generate the full month calendar between the first
    // and last order date (gap-free even if a month has no orders),
    // then left-join per-month order counts and exact decimal revenue.
    // The recursion is driver-free — Spark 4's WITH RECURSIVE plans the
    // UnionLoop itself; the grid is O(months), never O(rows), so the
    // iterative part stays trivially small while the joined aggregate
    // side is a normal partial+final shuffle at any scale. The upper
    // bound rides ALONG the recursion as a column (anchor computes it
    // once): a scalar subquery in the recursive term's WHERE would
    // re-scan the fact table on every one of the ~80 iterations —
    // measured 11 s vs 2 s for this query at sf0.1.
    "q75_recursive_cte" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        WITH RECURSIVE months(m, hi) AS (
          SELECT date_trunc('month', MIN(o_orderdate)),
                 date_trunc('month', MAX(o_orderdate)) FROM v_orders
          UNION ALL
          SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(o.rev, 0) AS DOUBLE) AS revenue
        FROM months LEFT JOIN (
          SELECT date_trunc('month', o_orderdate) AS om,
                 COUNT(*) AS n,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM v_orders GROUP BY date_trunc('month', o_orderdate)) o
          ON months.m = o.om
        ORDER BY month""")
    }),

    // Linear-regression aggregates. Hash-matched columns derive slope/
    // intercept/r² from exact DECIMAL sums (the q43 pattern: the only
    // order-independent formulation, rendered at %.9f below the
    // DECIMAL→DOUBLE ulp noise floor). Spark's native streaming
    // regr_slope/regr_intercept/regr_r2 aggregates are exercised too
    // and pinned to the exact values within 1e-6 relative tolerance —
    // their co-moment merge order varies with partitioning, so the
    // oracle checks the invariant (literal TRUE), not the bits.
    "q76_regr_stats" -> ((s, d) => {
      import s.implicits._
      // r20: fanOutScan before the fused decimal multiply-sums (the
      // q113 single-task seam). The hash-gated columns are exact
      // decimal sums (order-independent); the native regr_* values may
      // shift merge order, which the 1e-6-tolerance native_ok flag —
      // the only column they feed — absorbs by design.
      val sums = graft.Tables.fanOutScan(s, lineitem(s, d)
          .select($"l_returnflag", $"l_quantity", $"l_extendedprice"),
          $"l_extendedprice", $"l_quantity")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(dec($"l_quantity")).cast("double").as("sx"),
          sum(dec($"l_quantity") * dec($"l_quantity")).cast("double").as("sxx"),
          sum(dec($"l_extendedprice")).cast("double").as("sy"),
          sum(dec($"l_extendedprice") * dec($"l_extendedprice")).cast("double").as("syy"),
          sum(dec($"l_quantity") * dec($"l_extendedprice")).cast("double").as("sxy"),
          expr("regr_slope(l_extendedprice, l_quantity)").as("nslope"),
          expr("regr_intercept(l_extendedprice, l_quantity)").as("nicept"),
          expr("regr_r2(l_extendedprice, l_quantity)").as("nr2"))
      val slope = ($"n" * $"sxy" - $"sx" * $"sy") / ($"n" * $"sxx" - $"sx" * $"sx")
      val icept = ($"sy" - slope * $"sx") / $"n"
      val r2 = pow($"n" * $"sxy" - $"sx" * $"sy", 2) /
        (($"n" * $"sxx" - $"sx" * $"sx") * ($"n" * $"syy" - $"sy" * $"sy"))
      def close(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        abs(a - b) <= lit(1e-6) * (lit(1.0) + abs(b))
      sums.select($"l_returnflag", $"n",
        format_string("%.9f", slope).as("slope"),
        format_string("%.9f", icept).as("intercept"),
        format_string("%.9f", r2).as("r2"),
        (close($"nslope", slope) && close($"nicept", icept) && close($"nr2", r2))
          .as("native_ok"))
        .orderBy($"l_returnflag")
    }),

    // Time-weighted average — the right mean for irregularly sampled
    // sensor/metric streams (the reference's IoT domain): each reading
    // holds until the next one, so it weighs by its holding duration,
    // not by sample count. Exact across engines by construction:
    // durations are integer micros from lead(), values 2-decimal
    // DECIMALs, so both sums are exact and the one double division at
    // the end sees identical operands. One keyed window shuffle + a
    // partial+final aggregate — nothing corpus-sized crosses stages.
    "q78_time_weighted_avg" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"ts", $"event_id")
      events(s, d)
        .select($"event_type", $"ts", $"event_id", $"value")
        .withColumn("dur_us", micros(lead($"ts", 1).over(w)) - micros($"ts"))
        .filter($"dur_us".isNotNull) // last reading has no holding interval
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dur_us").as("total_dur_us"),
          // %.9f: the weighted sum's unscaled value exceeds 2^53, so
          // the DECIMAL→DOUBLE cast rounds differently at the last ulp
          // across engines (same noise floor as q43)
          format_string("%.9f",
            sum(dec($"value") * $"dur_us").cast("double") /
              sum($"dur_us").cast("double")).as("twa"))
        .orderBy($"event_type")
    }),

    // Theta sketches (Spark 4 DataSketches): the mergeable-sketch
    // family that, unlike HLL, supports SET ALGEBRA — intersection and
    // difference of audience sets without re-scanning raw data, the
    // standard 100 TB overlap-analytics shape (each side is a few KB of
    // sketch, the raw corpus is touched once). Below the sketch's 4096
    // nominal entries theta is EXACT, and this corpus has ≤1500
    // distinct users, so the oracle compares the estimates against
    // DuckDB's exact distinct counts at full hash precision.
    "q79_theta_sketch_ops" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .agg(
          expr("theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)")
            .as("sk_c"),
          expr("theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)")
            .as("sk_p"))
        .select(
          expr("CAST(theta_sketch_estimate(sk_c) AS BIGINT)").as("n_click_users"),
          expr("CAST(theta_sketch_estimate(sk_p) AS BIGINT)").as("n_purchase_users"),
          expr("CAST(theta_sketch_estimate(theta_intersection(sk_c, sk_p)) AS BIGINT)")
            .as("n_both"),
          expr("CAST(theta_sketch_estimate(theta_union(sk_c, sk_p)) AS BIGINT)")
            .as("n_either"),
          expr("CAST(theta_sketch_estimate(theta_difference(sk_c, sk_p)) AS BIGINT)")
            .as("n_click_only"))
    }),

    // Frequent-items sketch with explicit partial states: per-day
    // approx_top_k_accumulate, combine across days, estimate once —
    // the accumulate/combine split is the incremental-dashboard shape
    // (yesterday's states persist; only the new day re-scans). The
    // tracked-item budget (10) exceeds the column's cardinality (5),
    // so counts are exact and the explicit re-sort below makes the
    // output order engine-independent — the oracle recomputes exact
    // group counts.
    "q80_approx_top_k" -> ((s, d) => {
      import s.implicits._
      events(s, d)
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(expr("approx_top_k_accumulate(event_type, 10)").as("st"))
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(st), 10)").as("top"))
        .select(explode($"top").as("t"))
        .select($"t.item".as("item"), $"t.count".as("cnt"))
        .orderBy($"cnt".desc, $"item")
    }),

    // Dynamic-gap session windows: the native session_window operator
    // with a PER-EVENT gap (purchases hold a session open 45 min,
    // everything else 15) — the shape real engagement analytics needs,
    // where activity type determines the timeout. Spark merges
    // overlapping [ts, ts+gap) intervals per key with one keyed
    // shuffle; the oracle reproduces the merge exactly as a running
    // max of interval ends (boundary when ts >= max prior end), all in
    // integer micros.
    "q81_session_dynamic_gap" -> ((s, d) => {
      import s.implicits._
      // string gaps: session_window's dynamic form needs
      // CalendarIntervalType, which ANSI INTERVAL literals are not
      val gap = when($"event_type" === "purchase", lit("45 minutes"))
        .otherwise(lit("15 minutes"))
      events(s, d)
        .groupBy($"user_id", session_window($"ts", gap).as("sw"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .select($"user_id",
          micros($"sw.start").as("session_start_us"),
          micros($"sw.end").as("session_end_us"),
          $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start_us")
    }),

    // Retention cohort matrix — the product-analytics staple: each
    // user anchors at their first-activity week, then every (segment,
    // week-offset) cell counts users still active that many weeks
    // later. All integer arithmetic (week-truncated timestamps, day
    // diffs DIV 7, counts). Three keyed shuffles — the per-user anchor
    // agg, the distinct activity weeks, and the final cell agg; the
    // customer dim broadcasts.
    "q82_retention_cohorts" -> ((s, d) => {
      import s.implicits._
      val anchor = events(s, d).groupBy($"user_id")
        .agg(date_trunc("week", min($"ts")).as("c_week"))
      val activity = events(s, d)
        .select($"user_id", date_trunc("week", $"ts").as("a_week")).distinct()
      anchor.join(activity, "user_id")
        .join(broadcast(customer(s, d).select($"c_custkey", $"c_mktsegment")),
          $"user_id" === $"c_custkey")
        .groupBy($"c_mktsegment".as("segment"),
          expr("datediff(a_week, c_week) DIV 7").as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"segment", $"week_offset")
    }),

    // URL functions over a deterministically constructed URL column:
    // parse_url host/path/query + single-param extraction, plus a
    // form-encoding check. The oracle recomputes every parsed field
    // directly from the source columns — ground truth, not a parser
    // twin — so a parse_url regression fails the hash. Pure narrow
    // projection: codegen'd, zero shuffle at any scale.
    "q77_url_funcs" -> ((s, d) => {
      import s.implicits._
      val url = concat(lit("https://ex.com/"), $"event_type", lit("/"), $"user_id",
        lit("?uid="), $"user_id", lit("&t="), $"event_type")
      events(s, d).select(
        $"event_id",
        parse_url(url, lit("HOST")).as("host"),
        parse_url(url, lit("PATH")).as("path"),
        parse_url(url, lit("QUERY")).as("query"),
        parse_url(url, lit("QUERY"), lit("uid")).as("uid"),
        url_encode(concat(lit("t v="), $"event_type")).as("enc"))
        .orderBy($"event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q75_recursive_cte" ->
      """WITH RECURSIVE months(m, hi) AS (
        |  SELECT date_trunc('month', MIN(o_orderdate)),
        |         date_trunc('month', MAX(o_orderdate)) FROM orders
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
        |)
        |SELECT strftime(m, '%Y-%m') AS month,
        |       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(o.rev, 0) AS DOUBLE) AS revenue
        |FROM months LEFT JOIN (
        |  SELECT date_trunc('month', o_orderdate) AS om,
        |         COUNT(*) AS n,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY date_trunc('month', o_orderdate)) o
        |  ON months.m = o.om
        |ORDER BY month""".stripMargin,

    // Exact-sum regression stats; native-aggregate agreement pinned TRUE.
    "q76_regr_stats" ->
      """SELECT l_returnflag, n,
        | printf('%.9f', (n*sxy - sx*sy) / (n*sxx - sx*sx)) AS slope,
        | printf('%.9f', (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n) AS intercept,
        | printf('%.9f', ((n*sxy - sx*sy)*(n*sxy - sx*sy)) /
        |   ((n*sxx - sx*sx) * (n*syy - sy*sy))) AS r2,
        | TRUE AS native_ok
        |FROM (
        | SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "q82_retention_cohorts" ->
      """WITH anchor AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS c_week
        |  FROM events GROUP BY user_id),
        |activity AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS a_week FROM events)
        |SELECT c.c_mktsegment AS segment,
        |  date_diff('day', an.c_week, a.a_week) // 7 AS week_offset,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM anchor an
        |JOIN activity a ON an.user_id = a.user_id
        |JOIN customer c ON an.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY segment, week_offset""".stripMargin,

    // Session merge replayed as a running max of interval ends: an
    // event starts a new session iff its timestamp is at or past every
    // prior event's (ts + gap) in the key — identical to Spark's
    // overlapping-interval union. session_end is the max merged end.
    "q81_session_dynamic_gap" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |    CASE WHEN event_type = 'purchase' THEN 2700000000 ELSE 900000000 END AS gap_us
        |  FROM events),
        |m AS (
        |  SELECT *, MAX(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM g),
        |b AS (
        |  SELECT *, CASE WHEN prev_end IS NULL OR us >= prev_end THEN 1 ELSE 0 END AS boundary
        |  FROM m),
        |sflag AS (
        |  SELECT *, SUM(boundary) OVER (PARTITION BY user_id ORDER BY us, event_id
        |              ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id,
        |  MIN(us) AS session_start_us,
        |  MAX(us + gap_us) AS session_end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sflag GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    // Exact ground truth: every audience set is far below theta's
    // exact-mode capacity, so sketch estimates must equal the true
    // distinct counts bit-for-bit.
    "q79_theta_sketch_ops" ->
      """SELECT
        | (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click') AS n_click_users,
        | (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS n_purchase_users,
        | (SELECT COUNT(DISTINCT e1.user_id) FROM events e1
        |   WHERE e1.event_type = 'click'
        |     AND EXISTS (SELECT 1 FROM events e2
        |                 WHERE e2.user_id = e1.user_id AND e2.event_type = 'purchase')) AS n_both,
        | (SELECT COUNT(DISTINCT user_id) FROM events
        |   WHERE event_type IN ('click', 'purchase')) AS n_either,
        | (SELECT COUNT(DISTINCT e1.user_id) FROM events e1
        |   WHERE e1.event_type = 'click'
        |     AND NOT EXISTS (SELECT 1 FROM events e2
        |                 WHERE e2.user_id = e1.user_id AND e2.event_type = 'purchase')) AS n_click_only""".stripMargin,

    "q80_approx_top_k" ->
      """SELECT event_type AS item, COUNT(*) AS cnt
        |FROM events GROUP BY event_type
        |ORDER BY cnt DESC, item""".stripMargin,

    "q78_time_weighted_avg" ->
      """WITH t AS (
        |  SELECT event_type,
        |    LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us, value
        |  FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
        |  printf('%.9f', CAST(SUM(CAST(value AS DECIMAL(18,2)) * dur_us) AS DOUBLE)
        |    / CAST(SUM(dur_us) AS DOUBLE)) AS twa
        |FROM t WHERE dur_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Ground truth reconstructed from the source columns (DuckDB has no
    // parse_url): host is the constant authority, path/query/uid/enc
    // are string algebra over event_type and user_id ('t v=' form-
    // encodes to 't+v%3D'; event_type is [a-z]+, identity under
    // x-www-form-urlencoded).
    "q77_url_funcs" ->
      """SELECT event_id,
        | 'ex.com' AS host,
        | '/' || event_type || '/' || CAST(user_id AS VARCHAR) AS path,
        | 'uid=' || CAST(user_id AS VARCHAR) || '&t=' || event_type AS query,
        | CAST(user_id AS VARCHAR) AS uid,
        | 't+v%3D' || event_type AS enc
        |FROM events ORDER BY event_id""".stripMargin
  )
}
