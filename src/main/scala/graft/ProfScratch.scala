package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Scratch probe (not part of the gate): A/B of a fanned vs unfanned
  * documents scan under a representative tokenize+aggregate pipeline,
  * alternated in ONE session so co-tenant drift hits both arms. */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def entropy(docs: org.apache.spark.sql.DataFrame) = {
      val tc = docs.select($"doc_id", explode(tokens($"text")).as("tok"))
        .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("cnt"))
      tc.groupBy($"doc_id").agg(
          sum($"cnt").as("n_tokens"), count(lit(1)).as("n_types"),
          array_sort(collect_list(struct($"tok", $"cnt"))).as("arr"))
        .withColumn("ent", -aggregate($"arr", lit(0.0),
          (a, x) => a + (x.getField("cnt") * lit(1.0) / $"n_tokens") *
            log(x.getField("cnt") * lit(1.0) / $"n_tokens")))
        .select($"doc_id", $"n_tokens", $"n_types",
          format_string("%.9f", $"ent").as("entropy"))
        .orderBy($"doc_id")
    }
    def plain = Tables.documents(spark, d).select($"doc_id", $"text")
    def fanned = Tables.fanOutScan(spark,
      Tables.documents(spark, d).select($"doc_id", $"text"), $"doc_id")
    def run(label: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      entropy(df).write.format("noop").mode("overwrite").save()
      println(f"$label wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    run("warmP", plain); run("warmF", fanned)
    for (_ <- 1 to 4) { run("plain ", plain); run("fanned", fanned) }
    spark.stop()
  }
}
