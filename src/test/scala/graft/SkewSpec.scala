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

  test("static salted join equals the plain join and routes through (k, salt) exchanges") {
    // the complement of the AQE test above: the STATIC salting pattern
    // for engines/paths where AQE can't fire (streaming joins, fixed
    // plans) — fact rows fan their hot key over 16 salts, the dim side
    // replicates 16x, and the join key becomes (k, salt) so no reducer
    // owns the whole hot key. The salt NEVER changes semantics: any
    // per-row salt works because the dim carries every salt value.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val facts = spark.range(200000)
        .select(when($"id" % 10 < 9, 0L).otherwise($"id" % 100).as("k"),
          ($"id" % 997).as("v"))
      val dims = spark.range(100).select($"id".as("k"), ($"id" * 2 + 1).as("attr"))
      val plain = facts.join(dims, Seq("k"))
        .agg(count(lit(1)).as("n"), sum($"v" * $"attr").as("sva"))
        .collect()(0)
      val salted = facts
        .withColumn("salt", pmod(xxhash64($"k", $"v"), lit(16)).cast("int"))
      val dimX = dims
        .withColumn("salt", explode(sequence(lit(0), lit(15))))
        .withColumn("salt", $"salt".cast("int"))
      val sj = salted.join(dimX, Seq("k", "salt"))
        .agg(count(lit(1)).as("n"), sum($"v" * $"attr").as("sva"))
      val sp = sj.queryExecution.sparkPlan.toString
      assert(sp.contains("salt"), s"join did not key on the salt:\n${sp.take(1500)}")
      assert(sj.collect()(0) === plain,
        "salted join changed the join result")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
