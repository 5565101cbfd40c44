package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Sketch aggregates: bounded-state summaries that merge exactly —
  * the aggregation shapes that keep per-group state O(k) at 100 TB. */
object Sketches {

  /** KMV distinct-count sketch over a 60-bit hash column (use
    * [[graft.operators.Dedup.hash60]] so any SQL engine can replay the
    * hash). Returns a struct (est_distinct, kth_hash, n_kept);
    * deterministic, mergeable, map-side combinable — see
    * [[graft.functions.expr.KmvSketch]]. */
  def kmvDistinct(hash: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.expr.KmvSketch(ColumnBridge.expression(hash), k)
        .toAggregateExpression())
}
