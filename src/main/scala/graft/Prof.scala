package graft
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (round <- 1 to 3; q <- Seq("dedup_minhash_lsh","dedup_ngram_jaccard","dedup_simhash")) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"round$round $q%-24s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
