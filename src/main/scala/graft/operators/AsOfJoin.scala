package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.OracleParity._

/** True two-table as-of join — the trades⋈quotes shape (here: enrich
  * each event reading with the user's most recent prior "calibration"
  * record, the lookup the reference's README hints at for sensor
  * enrichment).
  *
  * Implementation is the UNION-MERGE form, not a range-condition join:
  * tag both tables, union them, and LOCF the right-side payload over a
  * (key, time) window. That costs exactly ONE shuffle keyed by the join
  * key and one sort per partition — while an inequality join
  * (`l.ts >= r.ts` + per-row max) either plans as a broadcast nested
  * loop or explodes to |L|×|R| rows per key before the argmax. At
  * 100 TB the union-merge is the only shape that survives: state per
  * task is a single LOCF register per payload column, and skewed keys
  * split fine under AQE because the window is per-key independent.
  */
object AsOfJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Backward as-of join: for each `left` row, attach the most recent
    * `right` row with `rightTime` <= `leftTime` on the same `keys`
    * (left rows with no prior right row get nulls — ASOF LEFT JOIN
    * semantics). Ties at the same instant match the right row (>=).
    *
    * `right`'s non-key columns must not collide with `left`'s — rename
    * before calling (q64 renames ts→calib_ts, value→calib_value).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTime)
    val collisions = (payload :+ rightTime).intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"asofBackward: right-side columns collide with left: ${collisions.mkString(",")}")
    // _side orders the right row BEFORE a left row at the same instant,
    // so equal-timestamp calibrations are visible to the reading (>=).
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.withColumn("_t", col(rightTime)).withColumn("_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all LOCF columns share one WindowSpec → a single Window operator,
    // one sort, no extra exchanges
    val filled = (payload :+ rightTime).foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_t", "_side")
  }

  val queries: Map[String, Q] = Map(
    // q64: events (clicks/views/errors/signups) as-of joined with the
    // user's purchase stream — each reading carries the latest prior
    // purchase's timestamp and value. Oracle: DuckDB's native ASOF
    // LEFT JOIN, so the semantics (>=, null when no prior row) are
    // pinned by an independent engine.
    "q64_asof_join2" -> ((s, d) => {
      import s.implicits._
      val ev = events(s, d)
      val readings = ev.filter($"event_type" =!= "purchase")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      val calib = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("calib_ts"), $"value".as("calib_value"))
      asofBackward(readings, calib, Seq("user_id"), "ts", "calib_ts")
        .select($"event_id", $"user_id", $"event_type",
          micros($"ts").as("ts_us"),
          micros($"calib_ts").as("calib_ts_us"),
          $"calib_value")
        .orderBy($"event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q64_asof_join2" ->
      """SELECT r.event_id, r.user_id, r.event_type,
        | epoch_us(r.ts) AS ts_us,
        | epoch_us(c.ts) AS calib_ts_us,
        | c.value AS calib_value
        |FROM (SELECT * FROM events WHERE event_type <> 'purchase') r
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') c
        | ON r.user_id = c.user_id AND r.ts >= c.ts
        |ORDER BY r.event_id""".stripMargin
  )
}
