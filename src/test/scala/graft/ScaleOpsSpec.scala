package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale-mechanism proofs for the curation operators: the distributed
  * prefix sum must reconstruct the exact global layout, and joins
  * against partitioned fact data must prune partitions dynamically from
  * a dimension filter (DPP) — the two mechanisms a 100 TB pipeline
  * depends on beyond static pushdown. */
class ScaleOpsSpec extends SparkSuite {
  import spark.implicits._

  test("pack_token_chunks offsets are globally contiguous in doc_id order") {
    val rows = SparkEntry.queries("pack_token_chunks")(spark, sf)
      .select($"doc_id", $"n_tokens", $"start_offset")
      .collect().sortBy(_.getLong(0))
    var expected = 0L
    rows.foreach { r =>
      assert(r.getLong(2) === expected,
        s"doc ${r.getLong(0)}: offset ${r.getLong(2)} != $expected")
      expected += r.getLong(1)
    }
  }

  test("join against a partitioned fact prunes partitions dynamically (DPP)") {
    val path = Files.createTempDirectory("graft-dpp").toString
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(path)
    // dim carries the filter; the fact's partition column is only
    // constrained through the join — static pruning can't see it
    // dim must be a real scan + filter: a literal Seq would constant-fold
    // into a LocalRelation and leave no selective predicate for DPP
    val dimPath = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter($"label" === "finished") // the selective predicate DPP keys off
    val joined = spark.read.parquet(path)
      .join(dim, $"o_orderstatus" === $"status")
      .groupBy($"label").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.explainString(FormattedMode)
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in plan:\n$plan")
    assert(joined.collect().head.getLong(1) > 0)
  }
}
