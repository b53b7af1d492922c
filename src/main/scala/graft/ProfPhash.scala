package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile of `mm_phash_dedup` (r18 verdict ask #3 — the
  * suite's slowest quiet query, 6.53 s): splits the pipeline into
  * meta-projection / PNG-encode / encode+decode-hash / full-query so
  * PLANS.md can name where the floor lives (the cf_slope_one
  * treatment). `runMain graft.ProfPhash`; SPARK_GRAFT_SF_DIR selects
  * the scale (default sf0.1). */
object ProfPhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      for (r <- 1 to 3) {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"round$r $name%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    def meta = graft.Tables.documents(spark, d).select($"doc_id",
      ($"doc_id" % 3 + 1).cast("int").as("px"),
      substring(md5(($"doc_id" % 40).cast("string").cast("binary")), 1, 16)
        .as("bits_hex"))
    def payloads = graft.multimodal.Multimodal.encodePatternPayloads(
      meta.select($"doc_id", ($"px" * 8).cast("int").as("scale"), $"bits_hex"))
    time("meta")(meta)
    time("encode")(payloads)
    time("encode+hash")(graft.multimodal.Multimodal.phashFeatures(payloads))
    time("full")(SparkEntry.queries("mm_phash_dedup")(spark, d))
    spark.stop()
  }
}
