package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width histogram quantile sketch: a mergeable per-group value
  * summary whose quantile estimates are DETERMINISTIC — unlike t-digest
  * or Greenwald-Khanna (both merge-order-sensitive), an equi-width
  * histogram is just a groupBy, so partial aggregation, shuffles, and
  * retries cannot move an estimate by a bit, and a SQL oracle can
  * replay the whole sketch including the interpolation arithmetic.
  * The trade-off is fixed resolution (range/buckets) instead of relative
  * error — the right trade for monitoring pipelines where
  * reproducibility outranks tail precision. State per group is at most
  * `buckets` rows however large the group: the 100 TB shape.
  */
object Quantiles {

  /** Per-group histogram-interpolated quantile estimates.
    *
    * Bounds come from one min/max aggregate (broadcast back); buckets
    * are equi-width over [lo, hi] with the top edge clamped into the
    * last bucket; the estimate interpolates linearly inside the bucket
    * containing the ceil(q·n)-th value. All double arithmetic is a
    * fixed IEEE expression tree, identical in any engine.
    *
    * @param qs quantiles in (0, 1], e.g. Seq(0.5, 0.9, 0.99)
    * @return (group, qtile, est) one row per group × quantile */
  def histQuantiles(df: DataFrame, group: Column, value: Column,
      buckets: Int, qs: Seq[Double]): DataFrame = {
    require(buckets >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val spark = df.sparkSession
    import spark.implicits._
    // NULL values drop at entry: Spark's ordered windows sort NULLS
    // FIRST, DuckDB's NULLS LAST, so a surviving NULL would shift
    // cumulative counts differently per engine (round-14 advisory);
    // n below therefore counts NON-NULL values, the only portable n
    val base = df.select(group.as("g"), value.cast("double").as("v"))
      .where(col("v").isNotNull)
    val bounds = base.groupBy("g").agg(min("v").as("__lo"), max("v").as("__hi"))
    val hist = base.join(broadcast(bounds), "g")
      .withColumn("b",
        when(col("__hi") === col("__lo"), lit(0L)).otherwise(
          least(lit((buckets - 1).toLong),
            floor((col("v") - col("__lo")) * lit(buckets.toDouble) /
              (col("__hi") - col("__lo"))).cast("long"))))
      .groupBy("g", "b").agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
        sum("cnt").over(Window.partitionBy("g").orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cumb", col("cum") - col("cnt"))
    val n = hist.groupBy("g").agg(sum("cnt").as("n"))
    val qf = qs.toDF("qtile")
    cum.join(broadcast(n), "g").crossJoin(broadcast(qf))
      .withColumn("target", ceil(col("qtile") * col("n")).cast("long"))
      .where(col("cum") >= col("target") && col("cumb") < col("target"))
      .join(broadcast(bounds), "g")
      .select(col("g").as("group"), col("qtile"),
        (col("__lo") +
          (col("b").cast("double") +
            (col("target") - col("cumb")).cast("double") / col("cnt").cast("double")) *
            (col("__hi") - col("__lo")) / lit(buckets.toDouble))
          .cast("decimal(18,4)").cast("double").as("est"))
  }

  /** Per-group EXACT lower median over an INTEGRAL value column,
    * computed from the (group, value) count histogram — never a row
    * sort: the only ordered window runs over the distinct-value frame,
    * bounded by the value DOMAIN rather than the row count (the house
    * bucket-frame rule — a column with 10⁹ rows but 10⁴ distinct
    * values medians over 10⁴ rows per group). Lower median = smallest
    * v whose cumulative count reaches ceil(n/2); exact, deterministic,
    * and replayable in any engine as integer arithmetic. NULL values
    * drop at entry (n counts non-null values): engines disagree on
    * NULL sort position (Spark NULLS FIRST, DuckDB NULLS LAST), so a
    * surviving NULL would shift every cumulative count and could even
    * BE the reported median (round-14 advisory).
    * Returns (g, n, med). */
  def histMedian(df: DataFrame, group: Column, value: Column): DataFrame = {
    val hist = df.select(group.as("g"), value.cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val n = hist.groupBy("g").agg(sum("cnt").as("n"))
    hist.withColumn("cum",
        sum("cnt").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(n), "g")
      .where(col("cum") >= expr("(n + 1) div 2")
        && col("cum") - col("cnt") < expr("(n + 1) div 2"))
      .select(col("g"), col("n"), col("v").as("med"))
  }

  /** Per-group EXACT rational quantiles over an integral column, the
    * [[histMedian]] machinery generalized: for each quantile num/den
    * the result is the ceil(n·num/den)-th order statistic — computed
    * as (n·num + den − 1) div den, so the target index, like the value
    * itself, never touches a float. One histogram, one ordered window
    * over the distinct-value frame, one broadcast quantile list.
    * Returns (g, n, qnum, qden, value) — one row per group × quantile. */
  def histExactQuantiles(df: DataFrame, group: Column, value: Column,
      qs: Seq[(Int, Int)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n2, d2) => n2 > 0 && n2 <= d2 },
      s"quantiles must be rationals in (0, 1]: $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.select(group.as("g"), value.cast("long").as("v"))
      .where(col("v").isNotNull) // NULLs drop: see histMedian
      .groupBy("g", "v").agg(count(lit(1)).as("cnt"))
    val n = hist.groupBy("g").agg(sum("cnt").as("n"))
    val qf = qs.toDF("qnum", "qden")
    hist.withColumn("cum",
        sum("cnt").over(Window.partitionBy("g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(n), "g")
      .crossJoin(broadcast(qf))
      .withColumn("target", expr("(n * qnum + qden - 1) div qden"))
      .where(col("cum") >= col("target")
        && col("cum") - col("cnt") < col("target"))
      .select(col("g"), col("n"), col("qnum"), col("qden"),
        col("v").as("value"))
  }

  /** Per-group robust dispersion: exact lower median plus MAD (median
    * absolute deviation — the lower median of |v − median| by the same
    * histogram construction), the outlier scale that a handful of
    * corrupt rows cannot move (unlike stddev, where one 10⁹-char
    * document shifts every z-score in its group). All integer order
    * statistics — no float, no sampling, no sort over rows.
    * Returns (g, n, med, mad). */
  def medianMad(df: DataFrame, group: Column, value: Column): DataFrame = {
    val base = df.select(group.as("g"), value.cast("long").as("v"))
    val med = histMedian(base, col("g"), col("v"))
    val dev = base.join(med.select(col("g"), col("med")), "g")
      .select(col("g"), abs(col("v") - col("med")).as("d"))
    val mad = histMedian(dev, col("g"), col("d"))
      .select(col("g"), col("med").as("mad"))
    med.join(mad, "g").select(col("g"), col("n"), col("med"), col("mad"))
  }
}
