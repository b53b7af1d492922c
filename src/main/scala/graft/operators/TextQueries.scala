package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text analysis over `documents` — filled in incrementally. */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
