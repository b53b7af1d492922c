package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Structural profile of a query: jobs / stages / tasks / shuffle
  * bytes via a SparkListener — the noise-free companion to graft.Prof
  * (wall clock on a busy host can't resolve sub-0.5 s deltas; job and
  * exchange counts are deterministic). `runMain graft.ProfJobs q1 ...`
  * — one warm-up run, one counted run per query. */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong; val shufW = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufR.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    for (q <- args.toSeq) {
      // warm-up run (substrates, codegen) — not counted
      spark.sharedState.cacheManager.clearCache()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      jobs.set(0); stages.set(0); tasks.set(0); shufR.set(0); shufW.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat before reading counters
      Thread.sleep(600)
      println(f"$q%-28s jobs=${jobs.get}%3d stages=${stages.get}%3d " +
        f"tasks=${tasks.get}%5d shufR=${shufR.get / 1024}%8d KB " +
        f"shufW=${shufW.get / 1024}%8d KB wall=$dt%6.2f s")
    }
    spark.stop()
  }
}
