package graft

/** Every declared query must run and return rows on sf0.001, and every
  * oracle key must reference a declared query. Value-level correctness
  * is the driver's DuckDB gate (tools/check.py locally). */
class QueriesSpec extends SparkSuite {

  test("oracleSql keys are a subset of queries keys") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no query name collides across operator files (Map ++ would silently drop one)") {
    import graft.operators._
    val files = Seq(
      "RelationalQueries" -> RelationalQueries.queries.keySet,
      "RelationalQueries2" -> RelationalQueries2.queries.keySet,
      "StreamingQueries" -> StreamingQueries.queries.keySet,
      "SamplingQueries" -> SamplingQueries.queries.keySet,
      "SourceQueries" -> graft.sources.SourceQueries.queries.keySet,
      "AcidQueries" -> graft.sources.AcidQueries.queries.keySet,
      "IotQueries" -> IotQueries.queries.keySet,
      "TextQueries" -> TextQueries.queries.keySet,
      "DedupQueries" -> DedupQueries.queries.keySet,
      "SimilarityQueries" -> SimilarityQueries.queries.keySet,
      "MultimodalQueries" -> MultimodalQueries.queries.keySet,
      "AsOfJoin" -> AsOfJoin.queries.keySet,
      "RelationalQueries3" -> RelationalQueries3.queries.keySet,
      "RelationalQueries4" -> RelationalQueries4.queries.keySet,
      "RelationalQueries5" -> RelationalQueries5.queries.keySet,
      "RelationalQueries6" -> RelationalQueries6.queries.keySet,
      "RelationalQueries7" -> RelationalQueries7.queries.keySet,
      "RelationalQueries8" -> RelationalQueries8.queries.keySet,
      "RelationalQueries9" -> RelationalQueries9.queries.keySet,
      "RelationalQueries10" -> RelationalQueries10.queries.keySet,
      "GraphQueries" -> GraphQueries.queries.keySet,
      "GraphQueries2" -> GraphQueries2.queries.keySet,
      "MlQueries" -> MlQueries.queries.keySet,
      "TextQueries2" -> TextQueries2.queries.keySet,
      "TextQueries3" -> TextQueries3.queries.keySet,
      "RelationalQueries11" -> RelationalQueries11.queries.keySet,
      "MlQueries2" -> MlQueries2.queries.keySet,
      "RelationalQueries12" -> RelationalQueries12.queries.keySet,
      "TextQueries4" -> TextQueries4.queries.keySet,
      "RelationalQueries13" -> RelationalQueries13.queries.keySet,
      "TextQueries5" -> TextQueries5.queries.keySet,
      "RelationalQueries14" -> RelationalQueries14.queries.keySet,
      "DedupQueries2" -> DedupQueries2.queries.keySet,
      "RelationalQueries15" -> RelationalQueries15.queries.keySet,
      "DedupQueries3" -> DedupQueries3.queries.keySet,
      "MlQueries3" -> MlQueries3.queries.keySet,
      "TextQueries6" -> TextQueries6.queries.keySet,
      "RelationalQueries16" -> RelationalQueries16.queries.keySet,
      "MlQueries4" -> MlQueries4.queries.keySet,
      "FeatureQueries" -> FeatureQueries.queries.keySet,
      "RelationalQueries17" -> RelationalQueries17.queries.keySet,
      "MlQueries5" -> MlQueries5.queries.keySet,
      "GraphQueries3" -> GraphQueries3.queries.keySet,
      "TextQueries7" -> TextQueries7.queries.keySet,
      "RelationalQueries18" -> RelationalQueries18.queries.keySet,
      "MlQueries6" -> MlQueries6.queries.keySet,
      "DedupQueries4" -> DedupQueries4.queries.keySet,
      "TextQueries8" -> TextQueries8.queries.keySet,
      "GraphQueries4" -> GraphQueries4.queries.keySet,
      "GraphQueries5" -> GraphQueries5.queries.keySet,
      "RelationalQueries19" -> RelationalQueries19.queries.keySet,
      "MlQueries7" -> MlQueries7.queries.keySet,
      "RelationalQueries20" -> RelationalQueries20.queries.keySet,
      "TextQueries9" -> TextQueries9.queries.keySet,
      "RelationalQueries21" -> RelationalQueries21.queries.keySet,
      "MlQueries8" -> MlQueries8.queries.keySet,
      "TextQueries10" -> TextQueries10.queries.keySet,
      "TextQueries11" -> TextQueries11.queries.keySet,
      "DedupQueries5" -> DedupQueries5.queries.keySet,
      "DedupQueries6" -> DedupQueries6.queries.keySet,
      "SimilarityQueries2" -> SimilarityQueries2.queries.keySet,
      "CurationQueries" -> CurationQueries.queries.keySet,
      "RelationalQueries22" -> RelationalQueries22.queries.keySet)
    val dupes = files.flatMap { case (f, ks) => ks.map(_ -> f) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"query keys declared in multiple files: ${
      dupes.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(files.map(_._2.size).sum === SparkEntry.queries.size,
      "merged queries map lost entries to a key collision")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("observe() metrics ride a pipeline without a second pass") {
    // the production monitoring hook: named metrics are collected
    // DURING the action (accumulator-style, zero extra scans) — the
    // shape a 100 TB pipeline uses for row-count/quality telemetry
    // instead of separate count() jobs over the same data
    import org.apache.spark.sql.functions._
    val obs = new org.apache.spark.sql.Observation("iot_metrics")
    val out = Tables.lineitem(spark, sf)
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("high_discount"))
      .filter(col("l_discount") > 0.05)
    val filtered = out.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > filtered,
      "observe should see pre-filter traffic")
    assert(m("high_discount").asInstanceOf[Long] === filtered,
      "observed metric must equal the filtered count without a second scan")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, returns rows, and emits only scalar columns on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // the driver's comparator can't hash array/struct/map cells —
      // a non-scalar output column silently zeroes the query's score
      import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
      df.schema.fields.foreach { f =>
        val complex = f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] || f.dataType.isInstanceOf[StructType]
        assert(!complex,
          s"$name column ${f.name} has non-scalar type ${f.dataType.simpleString}")
      }
      assert(df.count() > 0, s"$name returned zero rows")
    }
  }
}
