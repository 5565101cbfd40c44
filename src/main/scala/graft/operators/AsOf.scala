package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single latest
  * right row with `rightTs <= leftTs` in the same key group — the
  * temporal-lookup primitive behind "entity state as of T" /
  * "latest reference value at event time" queries that the reference's
  * versioned store answers by version scans
  * (zavod/zavod/archive/__init__.py versioned reads; statements carry
  * first_seen/last_seen SCD bounds — runtime/timestamps.py).
  *
  * Spark has no native as-of join. The naive encodings both fail at
  * scale: a range join (l.ts >= r.ts) explodes to |L|·avg-candidates
  * pairs before the per-row max, and a broadcast of the right side dies
  * when both sides are big. This is the scalable form: union the two
  * sides, ONE shuffle keyed on the join key, and a running
  * `last(ignoreNulls)` window ordered by (ts, side) — right rows sort
  * before the left row at equal timestamps, so ties are inclusive
  * (match-at-same-instant), the standard as-of semantics (DuckDB/kdb).
  * Cost is one exchange + one sort regardless of match fan-out.
  *
  * Equal-timestamp right duplicates have no winner under any as-of
  * definition; either pre-aggregate the right side to one row per
  * (key, ts), or pass `rightTieBreak` — the duplicate with the
  * greatest tie-break tuple wins, resolved INSIDE the one window sort
  * (no extra aggregation exchange).
  */
object AsOf {

  /** @param left  any frame containing `key` and `ts` columns
    * @param right `key`, `ts`, plus payload columns (all others)
    * @param rightTieBreak payload columns resolving equal-(key, ts)
    *   right duplicates: greatest tuple wins
    * @return left columns + right payload columns (null when no right
    *   row is at-or-before the left row's timestamp) */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns.filterNot(c => c == key || c == ts).toSeq
    // Collision guards (mirrors RangeJoin.pointInInterval): a left
    // column sharing a name with a right payload column would emit a
    // silently ambiguous duplicate-named output column, and an input
    // column named like the internal scratch columns would break the
    // union plan with an analysis error at best.
    val overlap = leftCols.toSet intersect payloadCols.toSet
    require(overlap.isEmpty,
      s"left and right payload column names must be disjoint; shared: ${overlap.mkString(", ")}")
    val reserved = Set("__pl", "__side", "__lrow", "__m")
    val reservedHit = (left.columns ++ right.columns).filter(reserved).distinct
    require(reservedHit.isEmpty,
      s"input columns collide with asOfJoin internals: ${reservedHit.mkString(", ")}")
    val plType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))
    val lType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))

    val rU = right.select(col(key), col(ts), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__pl"),
      lit(null).cast(lType).as("__lrow"))
    val lU = left.select(col(key), col(ts), lit(1).as("__side"),
      lit(null).cast(plType).as("__pl"),
      struct(leftCols.map(col): _*).as("__lrow"))

    require(rightTieBreak.forall(payloadCols.contains),
      s"tie-break columns must be right payload columns: $payloadCols")
    // (ts, side) dominate; the tie-break only orders right duplicates
    // within one (key, ts) instant so the running last() ends on the
    // greatest tuple. Left rows carry null __pl fields — side already
    // separates them, the tie-break never compares across sides.
    val ord = (col(ts) +: col("__side") +:
      rightTieBreak.map(c => col("__pl").getField(c))).map(_.asc)
    val w = Window.partitionBy(col(key))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rU.unionByName(lU)
      .withColumn("__m", last(col("__pl"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(key) +: col(ts) +:
        (leftCols.map(c => col(s"__lrow.$c").as(c)) ++
         payloadCols.map(c => col(s"__m.$c").as(c))): _*)
  }
}
