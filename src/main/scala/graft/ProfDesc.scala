package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job breakdown of one query: prints each job's id, description /
  * call site, stage count, task count and wall time — the "where do
  * the jobs come from" companion to [[ProfJobs]] (which only totals).
  * `runMain graft.ProfDesc <query> [warm]` — with `warm`, one uncounted
  * warm-up run first. */
object ProfDesc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = args(0)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val nTasks = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        import scala.jdk.CollectionConverters._
        val props = j.properties.stringPropertyNames().asScala
          .filter(k => k.contains("jobGroup") || k.contains("description") ||
            k.contains("callSite") || k.contains("streaming"))
          .map(k => s"$k=${j.properties.getProperty(k).take(120)}").mkString("; ")
        val desc = j.stageInfos.sortBy(_.stageId)
          .map(si => s"[${si.stageId}]${si.name}").mkString(" | ") + "  {" + props + "}"
        starts.put(j.jobId, (System.nanoTime(), desc))
        nTasks.put(j.jobId, j.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.get(e.jobId)).foreach { case (t0, desc) =>
          val dt = (System.nanoTime() - t0) / 1e9
          lines.add(f"job ${e.jobId}%3d ${dt}%6.3f s tasks=${nTasks.get(e.jobId)}%4d  $desc")
        }
      }
    })
    if (args.length > 1 && args(1) == "warm") {
      spark.sharedState.cacheManager.clearCache()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      Thread.sleep(500)
      lines.clear()
    }
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800)
    import scala.jdk.CollectionConverters._
    lines.asScala.toSeq.foreach(println)
    println(f"TOTAL $q wall=$dt%6.2f s jobs=${lines.size()}")
    spark.stop()
  }
}
