package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: match point rows to interval rows
  * (`lo <= pt <= hi`) without an equi-key — the T7 interval-overlap
  * predicate (zavod/zavod/integration/edges.py:129-195) lifted from a
  * bucket-local filter to a standalone scalable join.
  *
  * Spark plans a bare BETWEEN theta-join as a broadcast nested loop
  * (or a cartesian product when both sides are big): O(|P|·|I|)
  * comparisons. Banding quantizes the range dimension into fixed-width
  * bands, explodes each interval into the bands it covers, and
  * equi-joins points to bands — comparisons collapse to pairs sharing
  * a band, the join shuffles on the band key like any hash join, and
  * the exact BETWEEN runs as a residual filter. Each (point, interval)
  * pair meets in exactly one band (the point's), so no dedup pass is
  * needed. `bandWidth` trades interval replication (≈ span/bandWidth
  * copies) against candidate precision — set it near the typical
  * interval span.
  */
object RangeJoin {

  /** @param points    frame with numeric column `pt` (plus any payload)
    * @param intervals frame with numeric columns `lo`, `hi` (inclusive
    *   bounds, plus any payload); column names must not collide with
    *   `points`
    * @return points × matching intervals, all columns of both */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pt: String, lo: String, hi: String,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision: $overlap")
    val p = points.withColumn("__band",
      floor(col(pt) / bandWidth).cast("long"))
    val i = intervals.withColumn("__band",
      explode(sequence(floor(col(lo) / bandWidth).cast("long"),
        floor(col(hi) / bandWidth).cast("long"))))
    p.join(i, "__band")
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__band")
  }
}
