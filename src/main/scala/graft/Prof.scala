package graft
import org.apache.spark.sql.SparkSession

/** Ad hoc single-query timing loop: `runMain graft.Prof q1 q2 ...`
  * (3 rounds each, cache cleared between runs; SPARK_GRAFT_SF_DIR
  * selects the scale, default sf0.1). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("dedup_minhash_lsh","dedup_ngram_jaccard","dedup_simhash")
    for (round <- 1 to 3; q <- qs) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"round$round $q%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
