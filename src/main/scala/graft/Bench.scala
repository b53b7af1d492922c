package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced through a `noop` sink — unlike count(), the noop
  * write computes every output column (count() lets Catalyst prune the
  * projections, which would benchmark the scan, not the operator). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: exercise the code paths the measured queries
    // share (parquet scan, native shingle kernel, explode, hash join,
    // aggregate) so the alphabetically-first query doesn't absorb every
    // one-time class-load + janino compile.
    {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet").count()
      val ex = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.shingles3(split(col("text"), " "))).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
      ex.join(ex.withColumnRenamed("doc_id", "doc2"), "h")
        .groupBy(col("doc_id")).count().count()
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // each query pays its own scan/compute — no cross-query cache reuse
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
