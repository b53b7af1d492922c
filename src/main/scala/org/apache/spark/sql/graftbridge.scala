package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Public bridge to the private[sql] Column ⇄ Expression converters —
  * the supported extension point moved behind `classic` in Spark 4's
  * Connect refactor; extension libraries defining native expressions
  * need exactly these two hops. */
object graftbridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wrap a (typically just-checkpointed) DataFrame as a fresh
    * LogicalRDD WITHOUT origin statistics. `Dataset.localCheckpoint`
    * carries the checkpointed plan's estimated stats into the new
    * LogicalRDD; inside an iterative loop every round's joins then
    * MULTIPLY those `sizeInBytes` BigInts (Catalyst's
    * SizeInBytesOnlyStatsPlanVisitor.visitJoin is a plain product), so
    * the estimate's bit-length compounds geometrically round over
    * round and the driver ends up spending whole seconds in
    * BigInteger.multiply during planning (measured: 38 s in round 10
    * of dedup_semantic's CC loop — jstack showed
    * multiplyToomCook3 under visitJoin). Dropping the origin stats
    * resets the frame to `spark.sql.defaultSizeInBytes`; join
    * strategies inside such loops are decided by AQE from runtime
    * shuffle sizes anyway, which is also the correct behavior on a
    * real cluster. */
  def dropStats(df: Dataset[Row]): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    cds.queryExecution.optimizedPlan match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        // rebuild the node keeping rdd + partitioning/ordering, but
        // with NO origin stats (and no origin constraints — they also
        // grow with the origin plan)
        classic.Dataset.ofRows(cds.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming)(cds.sparkSession, None, None))
      case _ =>
        // not a checkpointed frame: fall back to an RDD re-wrap (adds
        // one scan layer, still resets the stats)
        cds.sparkSession.internalCreateDataFrame(
          cds.queryExecution.toRdd, df.schema, isStreaming = false)
    }
  }
}
