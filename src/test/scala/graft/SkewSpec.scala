package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: with one join key holding ~90% of the rows,
  * adaptive execution must split the oversized partition at runtime
  * (the complement to the static salting pattern in q24). Thresholds
  * are lowered so the technique fires at test scale; on a real cluster
  * the defaults (256 MB) do the same job. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 300k facts, ~90% on key 0; 100-row dim side (join forced to SMJ)
      val facts = spark.range(300000)
        .select(when($"id" % 10 < 9, 0L).otherwise($"id" % 100).as("k"),
          concat(lit("payload-"), $"id").as(("payload")))
      val dims = spark.range(100).select($"id".as("k"), ($"id" * 2).as("attr"))
      val joined = facts.join(dims, Seq("k"))
      // run THIS QueryExecution (count() would plan a separate query and
      // the inspected adaptive plan would never finalize)
      val n = joined.queryExecution.toRdd.count()
      assert(n === 300000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
