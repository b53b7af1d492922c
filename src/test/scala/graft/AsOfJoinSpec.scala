package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins q109's same-instant tiebreak (VERDICT r9 #3): two purchase
  * rows sharing (user_id, ts) must produce ONE deterministic answer —
  * the tie group's max value — independent of physical row order,
  * which is exactly the oracle's pre-reduced calib side (max(value)
  * per (user_id, ts)). Without the tie-group collapse, LOCF would pick
  * whichever row the sort happened to place last: a cross-engine
  * hash-parity flake waiting for a dataset refresh. */
class AsOfJoinSpec extends SparkSuite {

  // the driver writes events.ts as parquet TIMESTAMP(NANOS); the
  // loader reads it as a long of nanos (Tables.events), so the fixture
  // writes longs directly.
  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeEvents(rows: Seq[Row]): String = {
    val dir = Files.createTempDirectory("asof-tie").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q109: same-instant purchases collapse to the tie-group max in either physical order") {
    val t = 1700000000000000000L // nanos
    def purchase(id: Long, v: Double) = Row(id, t, 7L, "purchase", v, "{}")
    val reading = Row(100L, t + 60L * 1000000000L, 7L, "click", 1.0, "{}")
    val a = writeEvents(Seq(purchase(1L, 5.0), purchase(2L, 9.0), reading))
    val b = writeEvents(Seq(purchase(2L, 9.0), purchase(1L, 5.0), reading))
    val ra = graft.operators.AsOfJoin.queries("q109_asof_nearest")(spark, a).collect()
    val rb = graft.operators.AsOfJoin.queries("q109_asof_nearest")(spark, b).collect()
    assert(ra.toSeq === rb.toSeq, "answer depends on physical row order")
    assert(ra.length === 1)
    val r = ra.head
    assert(r.getAs[Double]("near_value") === 9.0, s"tie not collapsed to max: $r")
    assert(r.getAs[String]("direction") === "prior")
  }
}
