package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2.3): each entry
  * is a Spark DataFrame builder over the testdata dir, and (where SQL-
  * expressible) `oracleSql` carries its DuckDB twin. Column names and a
  * deterministic total ordering match on both sides.
  */
object SparkEntry {

  /** Flagship: the reference's entire dataflow (O1–O8 + D1–D3) run as one
    * Spark job over the reference's own fixtures. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    IotPipeline.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      RelationalQueries2.queries ++
      StreamingQueries.queries ++
      SamplingQueries.queries ++
      graft.sources.SourceQueries.queries ++
      graft.sources.AcidQueries.queries ++
      IotQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      SimilarityQueries2.queries ++
      MultimodalQueries.queries ++
      AsOfJoin.queries ++
      RelationalQueries3.queries ++
      RelationalQueries4.queries ++
      RelationalQueries5.queries ++
      RelationalQueries6.queries ++
      RelationalQueries7.queries ++
      RelationalQueries8.queries ++
      RelationalQueries9.queries ++
      GraphQueries.queries ++
      TextQueries2.queries ++
      RelationalQueries10.queries ++
      GraphQueries2.queries ++
      MlQueries.queries ++
      TextQueries3.queries ++
      RelationalQueries11.queries ++
      MlQueries2.queries ++
      RelationalQueries12.queries ++
      TextQueries4.queries ++
      RelationalQueries13.queries ++
      TextQueries5.queries ++
      RelationalQueries14.queries ++
      DedupQueries2.queries ++
      RelationalQueries15.queries ++
      DedupQueries3.queries ++
      MlQueries3.queries ++
      TextQueries6.queries ++
      RelationalQueries16.queries ++
      MlQueries4.queries ++
      FeatureQueries.queries ++
      RelationalQueries17.queries ++
      MlQueries5.queries ++
      GraphQueries3.queries ++
      TextQueries7.queries ++
      RelationalQueries18.queries ++
      MlQueries6.queries ++
      DedupQueries4.queries ++
      TextQueries8.queries ++
      GraphQueries4.queries ++
      GraphQueries5.queries ++
      RelationalQueries19.queries ++
      MlQueries7.queries ++
      RelationalQueries20.queries ++
      TextQueries9.queries ++
      RelationalQueries21.queries ++
      MlQueries8.queries ++
      TextQueries10.queries ++
      TextQueries11.queries ++
      DedupQueries5.queries ++
      DedupQueries6.queries ++
      CurationQueries.queries ++
      RelationalQueries22.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      RelationalQueries2.oracles ++
      StreamingQueries.oracles ++
      SamplingQueries.oracles ++
      graft.sources.SourceQueries.oracles ++
      graft.sources.AcidQueries.oracles ++
      IotQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      SimilarityQueries2.oracles ++
      MultimodalQueries.oracles ++
      AsOfJoin.oracles ++
      RelationalQueries3.oracles ++
      RelationalQueries4.oracles ++
      RelationalQueries5.oracles ++
      RelationalQueries6.oracles ++
      RelationalQueries7.oracles ++
      RelationalQueries8.oracles ++
      RelationalQueries9.oracles ++
      GraphQueries.oracles ++
      TextQueries2.oracles ++
      RelationalQueries10.oracles ++
      GraphQueries2.oracles ++
      MlQueries.oracles ++
      TextQueries3.oracles ++
      RelationalQueries11.oracles ++
      MlQueries2.oracles ++
      RelationalQueries12.oracles ++
      TextQueries4.oracles ++
      RelationalQueries13.oracles ++
      TextQueries5.oracles ++
      RelationalQueries14.oracles ++
      DedupQueries2.oracles ++
      RelationalQueries15.oracles ++
      DedupQueries3.oracles ++
      MlQueries3.oracles ++
      TextQueries6.oracles ++
      RelationalQueries16.oracles ++
      MlQueries4.oracles ++
      FeatureQueries.oracles ++
      RelationalQueries17.oracles ++
      MlQueries5.oracles ++
      GraphQueries3.oracles ++
      TextQueries7.oracles ++
      RelationalQueries18.oracles ++
      MlQueries6.oracles ++
      DedupQueries4.oracles ++
      TextQueries8.oracles ++
      GraphQueries4.oracles ++
      GraphQueries5.oracles ++
      RelationalQueries19.oracles ++
      MlQueries7.oracles ++
      RelationalQueries20.oracles ++
      TextQueries9.oracles ++
      RelationalQueries21.oracles ++
      MlQueries8.oracles ++
      TextQueries10.oracles ++
      TextQueries11.oracles ++
      DedupQueries5.oracles ++
      DedupQueries6.oracles ++
      CurationQueries.oracles ++
      RelationalQueries22.oracles
}
