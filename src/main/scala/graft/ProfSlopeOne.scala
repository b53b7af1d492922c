package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-off stage profiler for cf_slope_one (r17 verdict ask #4):
  * times each localCheckpoint-delimited stage of the query on its own
  * so PLANS.md can name the dominant cost. Mirrors the production
  * query in graft.operators.MlQueries6 stage-for-stage. */
object ProfSlopeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val CapK = 16

    for (round <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      var t0 = System.nanoTime()
      def lap(name: String): Unit = {
        println(f"round$round $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      val r = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d)
          .select($"o_orderkey".as("l_orderkey"), $"o_custkey"), Seq("l_orderkey"))
        .repartition(32, $"o_custkey")
        .groupBy($"o_custkey".as("c"), $"l_partkey".as("p"))
        .agg(sum($"l_quantity".cast("long")).as("r"))
      val capped = r
        .withColumn("rn", row_number().over(
          Window.partitionBy($"c").orderBy($"r".desc, $"p".asc)))
        .filter($"rn" <= CapK).select($"c", $"p", $"r")
        .localCheckpoint()
      lap("stage1_capped_ratings")
      println(s"       capped rows = ${capped.count()}")
      t0 = System.nanoTime()
      // variant: broadcast the orders projection (150k rows at sf0.1)
      // so lineitem never shuffles on l_orderkey — the only exchange
      // left is the o_custkey repartition
      Tables.lineitem(spark, d)
        .join(broadcast(Tables.orders(spark, d)
          .select($"o_orderkey".as("l_orderkey"), $"o_custkey")), Seq("l_orderkey"))
        .repartition(32, $"o_custkey")
        .groupBy($"o_custkey".as("c"), $"l_partkey".as("p"))
        .agg(sum($"l_quantity".cast("long")).as("r"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"c").orderBy($"r".desc, $"p".asc)))
        .filter($"rn" <= CapK).select($"c", $"p", $"r")
        .write.format("noop").mode("overwrite").save()
      lap("stage1_broadcast_variant")
      t0 = System.nanoTime()
      val wij = Window.partitionBy($"i", $"j")
      val pw = capped.as("a").join(capped.as("b"),
          $"a.c" === $"b.c" && $"a.p" < $"b.p")
        .select($"a.c".as("c"), $"a.p".as("i"), $"a.r".as("ri"),
          $"b.p".as("j"), $"b.r".as("rj"))
        .withColumn("nij", count(lit(1)).over(wij))
        .withColumn("diff", sum($"ri" - $"rj").over(wij).cast("long"))
        .withColumn("rn", row_number().over(wij.orderBy($"c".asc)))
        .selectExpr("c", "i", "ri", "j", "rj", "nij", "rn",
          "CAST(SIGN(diff) AS BIGINT) * ((1000 * abs(diff)) DIV nij) AS dev_milli")
        .localCheckpoint()
      lap("stage2_pairs_plus_dev")
      println(s"       pair rows = ${pw.count()}")
      t0 = System.nanoTime()
      // stage2b: the pair JOIN alone (no window) — splits enumeration
      // cost from the (i, j) window shuffle
      capped.as("a").join(capped.as("b"),
          $"a.c" === $"b.c" && $"a.p" < $"b.p")
        .select($"a.c".as("c"), $"a.p".as("i"), $"a.r".as("ri"),
          $"b.p".as("j"), $"b.r".as("rj"))
        .write.format("noop").mode("overwrite").save()
      lap("stage2b_pair_join_only")
      val preds = pw
        .select($"c", explode(array(
          struct($"i".as("tgt"), $"ri".as("r_tgt"), $"rj".as("r_oth"),
            lit(-1).as("sgn")),
          struct($"j".as("tgt"), $"rj".as("r_tgt"), $"ri".as("r_oth"),
            lit(1).as("sgn")))).as("leg"), $"nij", $"dev_milli")
        .select($"c", $"leg.tgt".as("tgt"), $"leg.r_tgt".as("r_tgt"),
          $"leg.r_oth".as("r_oth"), $"leg.sgn".as("sgn"), $"nij", $"dev_milli")
        .groupBy($"c", $"tgt", $"r_tgt")
        .agg(sum($"nij" * (lit(1000L) * $"r_oth" - $"sgn" * $"dev_milli")).as("num"),
          sum($"nij").as("den"))
        .selectExpr("c", "tgt", "r_tgt",
          "CAST(SIGN(num) AS BIGINT) * (abs(num) DIV den) AS pred_milli")
      val err = preds
        .agg(count(lit(1)).as("n_preds"),
          sum(abs(lit(1000L) * $"r_tgt" - $"pred_milli")).cast("long").as("sae"))
        .selectExpr("n_preds", "sae DIV n_preds AS mae_milli")
      val dev1 = pw.filter($"rn" === 1)
      val nPairs = dev1.agg(count(lit(1)).as("n_pairs"))
      dev1.orderBy($"nij".desc, $"i".asc, $"j".asc).limit(10)
        .crossJoin(broadcast(err))
        .crossJoin(broadcast(nPairs))
        .selectExpr("i AS part_i", "j AS part_j", "nij", "dev_milli",
          "n_pairs", "n_preds", "mae_milli")
        .orderBy($"nij".desc, $"part_i".asc, $"part_j".asc)
        .write.format("noop").mode("overwrite").save()
      lap("stage3_preds_and_assembly")
    }
    spark.stop()
  }
}
