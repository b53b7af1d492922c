package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.OracleParity._

/** Round-11 continuation: cross-series diagnostics.
  *
  *  - `q190_crosscorr_leadlag` — lead/lag cross-correlation between
  *    the daily order-intake series and the daily shipped-revenue
  *    series (the "how many days does demand lead fulfilment?"
  *    question every ops dashboard answers with exactly this scan).
  *
  * Exactness: both series collapse to calendar-day aggregates first
  * (dimension-sized — ≤ a few thousand rows at ANY corpus size), so
  * the per-lag Pearson runs over exact integer day-sums with
  * D19-factor decimal products, and r renders once through an
  * operand-identical double tree (the graph_assortativity idiom).
  */
object RelationalQueries12 {
  type Q = (SparkSession, String) => DataFrame

  private val D19 = DecimalType(19, 0)
  private val LAG = 7

  val queries: Map[String, Q] = Map(
    // CROSS-CORRELATION AT LAGS −7…+7: r(lag) = corr(orders(day),
    // revenue(day+lag)). Two one-pass keyed day-aggregates (the only
    // corpus-sized work), then a 15-way lag expansion of the ~2400-row
    // day table joined day-to-day — everything after the first two
    // aggregates is calendar-sized. is_peak marks the |r|-argmax lag
    // (IEEE-deterministic double compare, lag-asc tiebreak).
    "q190_crosscorr_leadlag" -> ((s, d) => {
      import s.implicits._
      val x = orders(s, d).groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).as("x"))
      val y = lineitem(s, d).groupBy(to_date($"l_shipdate").as("day"))
        .agg(sum((dec($"l_extendedprice") * 100).cast("long")).as("y"))
      val lags = s.range(-LAG, LAG + 1).select($"id".cast("int").as("lag"))
      val xy = x.crossJoin(broadcast(lags))
        .withColumn("yday", date_add($"day", $"lag"))
        .join(y.select($"day".as("yday"), $"y"), Seq("yday"))
      val g = xy.groupBy($"lag").agg(
        count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x".cast(D19) * $"x".cast(D19)).as("sxx"),
        sum($"y".cast(D19) * $"y".cast(D19)).as("syy"),
        sum($"x".cast(D19) * $"y".cast(D19)).as("sxy"))
      val nD = $"n_days".cast("double")
      def dc(c: org.apache.spark.sql.Column) = c.cast("double")
      val scored = g.withColumn("r_d",
        (nD * dc($"sxy") - dc($"sx") * dc($"sy")) /
          (sqrt(nD * dc($"sxx") - dc($"sx") * dc($"sx")) *
           sqrt(nD * dc($"syy") - dc($"sy") * dc($"sy"))))
      scored // 15 rows: dimension-sized window
        .withColumn("rk",
          row_number().over(Window.orderBy(abs($"r_d").desc, $"lag".asc)))
        .select($"lag", $"n_days",
          format_string("%.9f", $"r_d").as("r"),
          ($"rk" === 1).as("is_peak"))
        .orderBy($"lag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q190_crosscorr_leadlag" ->
      s"""WITH x AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |y AS (
         |  SELECT CAST(l_shipdate AS DATE) AS day,
         |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS y
         |  FROM lineitem GROUP BY 1),
         |lags AS (SELECT CAST(range AS INTEGER) AS lag FROM range(-$LAG, ${LAG + 1})),
         |xy AS (
         |  SELECT l.lag, x.x, y.y
         |  FROM x CROSS JOIN lags l
         |  JOIN y ON y.day = x.day + l.lag),
         |g AS (
         |  SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
         |    SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy,
         |    SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy
         |  FROM xy GROUP BY lag),
         |scored AS (
         |  SELECT lag, n_days,
         |    (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |    / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |      * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r_d
         |  FROM g),
         |ranked AS (
         |  SELECT *, row_number() OVER (ORDER BY abs(r_d) DESC, lag ASC) AS rk
         |  FROM scored)
         |SELECT lag, n_days, printf('%.9f', r_d) AS r, rk = 1 AS is_peak
         |FROM ranked ORDER BY lag""".stripMargin
  )
}
