package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: exercises the driver's t1 contract —
  * `SparkEntry.entry` on sf0.001 must return rows > 0 — and prints the
  * flagship output so IoT semantics are eyeballable end-to-end. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(50, truncate = false)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
