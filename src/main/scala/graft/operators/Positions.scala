package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J13: position categorisation against a stateful review table
  * (zavod/zavod/stateful/positions.py:46-108): every position entity
  * looks up its review row; positions never seen before get a default
  * 'pending' row appended to the state (upsert-on-miss), so human
  * reviewers see exactly the new arrivals.
  */
object Positions {

  /** positions: (position_id, ...); state: (position_id, category,
    * reviewed_by). Returns (categorized, newStateRows). */
  def categorize(positions: DataFrame, state: DataFrame): (DataFrame, DataFrame) = {
    val categorized = positions
      .join(state, Seq("position_id"), "left")
      .withColumn("category", coalesce(col("category"), lit("pending")))
    val newRows = positions.select(col("position_id")).distinct()
      .join(state, Seq("position_id"), "left_anti")
      .select(col("position_id"), lit("pending").as("category"),
        lit(null).cast("string").as("reviewed_by"))
    (categorized, newRows)
  }
}
