package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Scratch probe (not part of the gate): counts jobs across repeated
  * calls of individual pieces to localize per-run rebuild work. */
object ProfScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def probe(label: String)(f: => Unit): Unit = {
      Thread.sleep(400); jobs.set(0)
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(f"$label%-28s jobs=${jobs.get}%3d wall=$dt%6.2f s")
    }
    probe("ensureChain#1") { graft.sources.AcidQueries.ensureChain(spark, d) }
    probe("ensureChain#2") { graft.sources.AcidQueries.ensureChain(spark, d) }
    probe("acid_mv#1") {
      SparkEntry.queries("stream_acid_mv")(spark, d).write.format("noop").mode("overwrite").save()
    }
    probe("acid_mv#2") {
      SparkEntry.queries("stream_acid_mv")(spark, d).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
