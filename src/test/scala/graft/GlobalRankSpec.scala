package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** GlobalRank is the repo's answer to "exact global order without a
  * single-partition window" — pin its algebra against Spark's own
  * (single-partition) window functions on small data, where the
  * reference implementation is affordable. */
class GlobalRankSpec extends SparkSuite {
  import spark.implicits._

  private def sample = {
    // duplicate keys + a unique tiebreak, shuffled input order
    val rows = (1 to 257).map(i => ((i * 7919) % 101, i.toLong))
    rows.toDF("k", "id").repartition(7)
  }

  test("withRank equals the single-partition row_number on a total order") {
    val (ranked, n) = GlobalRank.withRank(sample, "r", Seq($"k", $"id"))
    assert(n === 257L)
    val expected = sample.withColumn("r0",
      row_number().over(Window.orderBy($"k", $"id")).cast("long"))
    val bad = ranked.join(expected, Seq("k", "id"))
      .filter($"r" =!= $"r0").count()
    assert(bad === 0L, "two-pass rank diverged from the reference window rank")
  }

  test("withRank handles desc sort orders") {
    val (ranked, _) = GlobalRank.withRank(sample, "r", Seq($"k".desc, $"id"))
    val expected = sample.withColumn("r0",
      row_number().over(Window.orderBy($"k".desc, $"id")).cast("long"))
    assert(ranked.join(expected, Seq("k", "id")).filter($"r" =!= $"r0").count() === 0L)
  }

  test("ntileFromRank reproduces SQL NTILE exactly, including ragged buckets") {
    // 257 rows into 8 buckets: 257 = 8*32 + 1 -> first bucket 33 rows
    for (buckets <- Seq(1, 2, 8, 10, 100, 257, 300)) {
      val (ranked, n) = GlobalRank.withRank(sample, "r", Seq($"k", $"id"))
      val got = ranked.withColumn("b", GlobalRank.ntileFromRank($"r", n, buckets))
      val expected = sample.withColumn("b0",
        ntile(buckets).over(Window.orderBy($"k", $"id")))
      val bad = got.join(expected, Seq("k", "id")).filter($"b" =!= $"b0").count()
      assert(bad === 0L, s"ntileFromRank($buckets) != NTILE($buckets)")
    }
  }

  test("withPrefixSum equals the single-partition running sum") {
    val df = sample.withColumn("w", ($"id" % 5 + 1).cast("long"))
    val (cum, total) = GlobalRank.withPrefixSum(df, "cw", col("w"), Seq($"k", $"id"))
    assert(total === df.agg(sum($"w")).head.getLong(0))
    val expected = df.withColumn("cw0",
      sum($"w").over(Window.orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(cum.join(expected, Seq("k", "id")).filter($"cw" =!= $"cw0").count() === 0L)
  }

  test("withRank and withPrefixSum tolerate empty input") {
    val empty = sample.filter($"k" < 0)
    val (r, n) = GlobalRank.withRank(empty, "r", Seq($"k", $"id"))
    assert(n === 0L && r.count() === 0L)
    val (c, t) = GlobalRank.withPrefixSum(
      empty.withColumn("w", lit(1L)), "cw", col("w"), Seq($"k", $"id"))
    assert(t === 0L && c.count() === 0L)
  }

  test("rank is invariant to the input's physical partitioning") {
    def ranks(parts: Int) = {
      val (r, _) = GlobalRank.withRank(sample.repartition(parts), "r", Seq($"k", $"id"))
      r.select($"id", $"r").collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    }
    assert(ranks(1) === ranks(13))
  }
}
