package graft

import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan shape assertions: the scale story is only real if the
  * optimizer actually produces the plans the design assumes. These pin
  * pushdown, broadcast choice, top-k planning, and the absence of
  * cartesian products so a refactor can't silently regress them. */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(FormattedMode)

  test("q02: filters are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThan(l_discount,0.03)"))
    assert(p.contains("LessThan(l_quantity,25.0)"))
  }

  test("q02: scan reads only the referenced columns") {
    val p = plan("q02_filter_project")
    val readSchema = p.linesIterator.find(_.startsWith("ReadSchema:")).get
    assert(!readSchema.contains("l_partkey"), "column pruning failed")
    assert(!readSchema.contains("l_returnflag"))
  }

  test("q04/q05: dimension joins broadcast (no fact-side shuffle for the join)") {
    assert(plan("q04_broadcast_join_agg").contains("BroadcastHashJoin"))
    val p5 = plan("q05_revenue_by_nation")
    assert(p5.contains("BroadcastHashJoin"))
  }

  test("q03: global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q03_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q06/q07: semi and anti joins plan as such") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    assert(plan("q01_pricing_summary").contains("partial_sum"))
  }

  test("pack_token_chunks: prefix sum is distributed (no single-partition window)") {
    val p = plan("pack_token_chunks")
    assert(!p.contains("SinglePartition"),
      "global offset fell back to a one-task window")
  }

  test("src_parquet_partitioned: status filter prunes partitions at the scan") {
    val p = plan("src_parquet_partitioned")
    val pf = p.linesIterator.find(_.trim.startsWith("PartitionFilters:")).get
    assert(pf.contains("o_orderstatus"), s"no partition pruning: $pf")
  }

  test("q64: as-of join is one shuffle keyed by the join key, no nested loop") {
    val p = plan("q64_asof_join2")
    assert(!p.contains("BroadcastNestedLoopJoin"), "as-of fell back to a nested loop")
    assert(p.contains("Window"), "union-merge LOCF window missing")
  }

  test("q65: interval overlap plans as a broadcast equi-join, not a nested loop") {
    val p = plan("q65_interval_join")
    assert(p.contains("BroadcastHashJoin"), "incident join not broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin"), "overlap fell back to a theta join")
  }

  test("dedup_repeated_ngrams: top-k rides TakeOrdered over a partial+final agg") {
    val p = plan("dedup_repeated_ngrams")
    assert(p.contains("TakeOrderedAndProject"), "top-20 planned as a full sort")
    assert(p.contains("partial_count") || p.contains("partial"), "no map-side combine")
  }

  test("text_chunk_stride: no shuffle before the output sort") {
    val p = plan("text_chunk_stride")
    // exactly one exchange — the final range partitioning for ORDER BY
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"chunking shuffled $exchanges times:\n${p.take(1500)}")
  }

  test("q75: recursion plans as UnionLoop with the monthly agg broadcast to it") {
    val p = plan("q75_recursive_cte")
    assert(p.contains("UnionLoop"), "recursive CTE should plan as UnionLoop")
    assert(p.contains("BroadcastHashJoin"),
      "the month grid should broadcast-join the aggregate, not shuffle it")
  }

  test("q78: groupBy reuses the window's hash partitioning (one keyed shuffle)") {
    val p = plan("q78_time_weighted_avg")
    // exactly 2 exchanges: the keyed window shuffle + the 5-row final sort
    val exchanges = p.linesIterator.count(_.trim.stripPrefix(":- ").stripPrefix("+- ")
      .startsWith("Exchange"))
    assert(exchanges <= 2,
      s"time-weighted avg shuffled $exchanges times (window partitioning not reused)")
  }

  test("q86: skyline is prefix-max + join-back, never a dominance nested loop") {
    val p = plan("q86_skyline")
    assert(p.contains("Window"), "per-price prefix-max window missing")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "skyline fell back to a quadratic dominance join")
  }

  test("q87: bloom prefilter probes a scalar-subquery sketch in the scan filter") {
    val p = plan("q87_bloom_prefilter")
    assert(p.contains("might_contain"), "bloom probe missing from the plan")
    assert(p.toLowerCase.contains("subquery"),
      "bloom sketch should be built once as a scalar subquery")
  }

  test("q91/q83: sequence windows stay keyed (no single-partition window)") {
    assert(!plan("q91_markov_transitions").contains("SinglePartition"),
      "markov lead() window collapsed to one task")
    assert(!plan("q83_rolling_anomaly").contains("SinglePartition"),
      "rolling anomaly window collapsed to one task")
  }

  test("join strategy hints are honored (broadcast / merge / shuffle_hash)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey")
    def planOf(j: org.apache.spark.sql.DataFrame) =
      j.queryExecution.sparkPlan.toString
    assert(planOf(li.join(org.apache.spark.sql.functions.broadcast(o),
      li("l_orderkey") === o("o_orderkey"))).contains("BroadcastHashJoin"))
    assert(planOf(li.join(o.hint("merge"),
      li("l_orderkey") === o("o_orderkey"))).contains("SortMergeJoin"))
    assert(planOf(li.join(o.hint("shuffle_hash"),
      li("l_orderkey") === o("o_orderkey"))).contains("ShuffledHashJoin"))
  }

  test("no query plans a CartesianProduct") {
    SparkEntry.queries.keys.foreach { name =>
      assert(!plan(name).contains("CartesianProduct"), s"$name has a cartesian product")
    }
  }
}
