package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: measured recall@K of each ANN index vs the exact top-K,
  * per scale factor — the numbers the `sim_knn_*_check` floors are
  * calibrated from. One rule for all four indexes: floor = measured
  * recall at the WORST of the three SFs minus 400 bp (ONE pair of the
  * 25-pair denominator) — LSH 4000−400=3600, IVF 4000−400=3600,
  * PQ 7200−400=6800, IVFPQ 4000−400=3600 (r19: measured EQUAL to IVF
  * at every SF — the cell probe binds; residual quantization costs
  * zero recall through the 256-wide exact re-rank) — the pipelines
  * are deterministic, so any lost pair beyond the calibrated state is
  * a real index regression, not noise. LSH/IVF/PQ last measured r12
  * (2026-08-14), unchanged r19.
  * `runMain graft.RecallProbe [sfDir ...]` (defaults to all three). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (d <- dirs;
         idx <- Seq("sim_knn_lsh", "sim_knn_ivf", "sim_knn_pq", "sim_knn_ivfpq")) {
      val brute = SparkEntry.queries("sim_knn_brute")(spark, d).select("q_id", "vec_id")
      val ann = SparkEntry.queries(idx)(spark, d).select("q_id", "vec_id")
      val hits = ann.join(brute, Seq("q_id", "vec_id")).count()
      val denom = brute.count()
      println(f"$d%-28s $idx%-12s recall ${hits.toDouble / denom}%.3f ($hits/$denom)")
    }
    // filtered ANN (r20): the baseline is the exact FILTERED flat scan
    // — same label predicate, same integer ranking — not sim_knn_brute
    for (d <- dirs) {
      val exact = graft.operators.SimilarityQueries2.filteredExact(spark, d)
        .select("q_id", "vec_id")
      val ann = SparkEntry.queries("sim_knn_filtered")(spark, d)
        .select("q_id", "vec_id")
      val hits = ann.join(exact, Seq("q_id", "vec_id")).count()
      val denom = exact.count()
      println(f"$d%-28s sim_knn_filtered recall ${hits.toDouble / denom}%.3f ($hits/$denom)")
    }
    spark.stop()
  }
}
