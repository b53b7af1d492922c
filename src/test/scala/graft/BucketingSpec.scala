package graft

import org.apache.spark.sql.execution.FormattedMode
import java.nio.file.Files

/** Bucketing = the pre-shuffle: writing both fact tables bucketed on the
  * join key lets every future join between them run with NO exchange —
  * at 100 TB this converts the recurring lineitem⋈orders shuffle into a
  * one-time layout cost. This spec proves the plan shape end-to-end
  * (write bucketed → join → assert no Exchange → values match the
  * shuffled join). */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed lineitem⋈orders join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    // at test scale the dim would auto-broadcast, hiding the bucket
    // layout; force the large-table regime the technique exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")

      // the bucket layout satisfies the join's distribution + ordering:
      // sort-merge join with ZERO exchanges anywhere in the plan
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), $"l_orderkey" === $"o_orderkey")

    // and the result matches the plain (shuffled) join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").count()
      .orderBy($"o_orderstatus").collect().toSeq
    val got = joined.groupBy($"o_orderstatus").count()
      .orderBy($"o_orderstatus").collect().toSeq
    assert(got === expected)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("cell-bucketed ANN index scans only the probed buckets") {
    // the 100 TB IVF layout: the corpus persisted bucketed by cell id,
    // so an nProbe-cell query physically reads nProbe/16 of the files —
    // bucket pruning is the disk-level analogue of the in-memory
    // (cell = key) probe join the sim_knn_ivf query plans
    val wh = Files.createTempDirectory("graft-warehouse-ann").toString
    spark.sql("DROP TABLE IF EXISTS emb_cells")
    import org.apache.spark.sql.functions._
    Tables.embeddings(spark, sf)
      .withColumn("cell", pmod(xxhash64($"vec_id"), lit(16)).cast("int"))
      .write.bucketBy(16, "cell")
      .option("path", s"$wh/emb_cells").saveAsTable("emb_cells")
    // a scan-only query has no distribution requirement, so the
    // planner's auto-bucketed-scan heuristic would flatten the layout
    // and lose the pruning — pin it on for the probe
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      val probed = spark.table("emb_cells").filter($"cell".isin(1, 5, 9, 13))
      val plan = probed.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SelectedBucketsCount: 4 out of 16"),
        s"bucket pruning did not engage:\n$plan")
      // pruned read returns exactly the probed cells' vectors
      val expected = Tables.embeddings(spark, sf)
        .withColumn("cell", pmod(xxhash64($"vec_id"), lit(16)).cast("int"))
        .filter($"cell".isin(1, 5, 9, 13)).count()
      assert(probed.count() === expected)
    } finally spark.conf.set(autoKey, prevAuto)
    spark.sql("DROP TABLE IF EXISTS emb_cells")
  }
}
