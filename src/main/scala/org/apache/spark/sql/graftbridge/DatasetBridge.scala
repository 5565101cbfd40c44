package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** LogicalPlan → DataFrame bridge: `Dataset.ofRows` is `private[sql]`
  * on the classic backend in Spark 4, and a library shipping its own
  * logical operators (graft.plans.TopKPerGroup) needs exactly this one
  * hop to hand a constructed plan back to the public API — same
  * pattern (and caveats) as [[ColumnBridge]]. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
