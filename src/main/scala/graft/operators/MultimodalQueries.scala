package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal operators — filled in incrementally. */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
