package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-generated testdata tables (TESTDATA.md) plus
  * oracle-parity helpers shared by every query builder.
  *
  * Scale notes: all loads are plain columnar Parquet scans — Catalyst
  * pushes filters/projections into the scan, so a 100 TB variant of a
  * table only reads the referenced columns and matching row groups.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has been generated as parquet TIMESTAMP(NANOS) in some
    * rounds (which Spark's vectorized reader rejects — read as long
    * nanos and rebuild micros via integer division, the same truncation
    * DuckDB applies narrowing ns → µs) and plain TIMESTAMP(MICROS) in
    * others (arrives as TIMESTAMP_NTZ — cast to the session-UTC
    * TimestampType, value-preserving). Dispatch on the actual file
    * schema so either generation reads identically on both engines. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Determinism helpers for DuckDB-oracle parity.
  *
  * Floating-point SUM/AVG over doubles is order-dependent, and Spark's
  * partial+final aggregation order differs from DuckDB's. We therefore
  * aggregate money-like doubles through DECIMAL(18,2) (exact in both
  * engines) and cast the exact result back to DOUBLE — bit-identical
  * output on both sides regardless of execution order. This is also the
  * right call at 100 TB: decimal sums stay inside whole-stage codegen
  * and partial aggregation, so the exactness is free.
  */
object OracleParity {
  private val D = DecimalType(18, 2)

  /** Cast a money-like double column to exact decimal. */
  def dec(c: Column): Column = c.cast(D)

  /** Order-independent exact sum of a 2-decimal double, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact sum of an already-decimal expression, as double. */
  def dsumExpr(c: Column): Column = sum(c).cast("double")

  /** Order-independent mean: exact decimal sum divided by count. */
  def davg(c: Column): Column =
    sum(c.cast(D)).cast("double") / count(lit(1))

  /** Timestamp rendered as a canonical string (second precision) so the
    * parquet-vs-DuckDB timestamp encodings can never disagree. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Timestamp as exact epoch microseconds (bigint) — for event data
    * that carries sub-second precision. */
  def micros(c: Column): Column = unix_micros(c)
}
