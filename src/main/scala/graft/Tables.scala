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
  /** r20: the documents corpus lands as ONE single-row-group parquet
    * file at gate SFs, so every text query's tokenize/shingle explode
    * ran inside a one-task scan (the q113 seam, family-wide). Fan it
    * out keyed by doc_id — a no-op once the corpus has real file
    * parallelism (fanOutScan's guard), measured +15–20% on the
    * tokenize+aggregate shape and neutral on trivial consumers. All
    * text parity arithmetic is per-doc or order-independent exact. */
  def documents(s: SparkSession, d: String): DataFrame =
    fanOutScan(s, table(s, d, "documents"), col("doc_id"))
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a NARROW scan out across the session's cores before heavy
    * per-row work (r20, guide §2.5 input skew): the gate tables land
    * as single-row-group parquet files, so a scan is ONE partition and
    * any expensive fused kernel (wide DECIMAL multiply chains, edit
    * distance, codecs) serializes on one task with the other cores
    * idle. Scale-adaptive: a scan that already splits (any real table
    * at production sizes — thousands of row groups) passes through
    * untouched, so this never adds a fact-table shuffle where the
    * input's own parallelism is the honest source. Round-robin keeps
    * aggregate results identical (callers only hang order-independent
    * aggregates off it). Project BEFORE calling — only the needed
    * columns should cross the exchange.
    *
    * Keyed variant: pass high-cardinality `keys` so the exchange is a
    * plain HashPartitioning — a keyless round-robin repartition first
    * LOCALLY SORTS its input (sortBeforeRepartition, the retry-
    * determinism guard), which on a single-partition scan serializes a
    * full-table sort onto the one task the fan-out is trying to
    * relieve (measured: the q113 scan task stayed ~0.8 s round-robin,
    * drops with hash keys). */
  def fanOutScan(s: SparkSession, df: DataFrame, keys: Column*): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df
    else if (keys.nonEmpty) df.repartition(p, keys: _*)
    else df.repartition(p)
  }
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
