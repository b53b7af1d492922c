package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF examples (SURVEY.md §2.3 "UDF / UDAF / UDTF" row).
  *
  * Aggregators compile to Catalyst partial+final aggregation like any
  * built-in — the buffer merges map-side, so a hot group never funnels
  * raw rows to one reducer.
  */
object TypedAggregators {

  /** Exact mean via (sum, count) buffer — the canonical Aggregator shape.
    * Sums in cents (long) so the result is order-independent and
    * bit-exact against the DuckDB oracle. */
  object CentsAvg extends Aggregator[Double, (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), v: Double): (Long, Long) =
      (b._1 + math.round(v * 100), b._2 + 1)
    override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else (b._1.toDouble / 100.0) / b._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k (largest values) per group with an insertion-sorted
    * buffer — a sketch-style Aggregator whose state stays O(k) however
    * many rows a group has (the property that matters at 100 TB). */
  class TopK(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
    override def zero: List[Double] = Nil
    override def reduce(b: List[Double], v: Double): List[Double] =
      ((v :: b).sorted(Ordering[Double].reverse)).take(k)
    override def merge(a: List[Double], b: List[Double]): List[Double] =
      ((a ++ b).sorted(Ordering[Double].reverse)).take(k)
    override def finish(b: List[Double]): Seq[Double] = b
    override def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
