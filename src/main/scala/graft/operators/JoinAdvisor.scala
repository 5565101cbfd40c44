package graft.operators

import graft.functions.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-driven join planning advice — what a cost-based optimizer
  * does with NDV statistics, operationalized from the engine's own KMV
  * sketches (q160/q175 machinery) instead of a table scan:
  *
  *  - NDV of each side's join key from the KMV aggregate (exact
  *    integer estimator, mergeable, map-side combinable);
  *  - estimated COMMON key count from the θ-intersection of the two
  *    k-min samples (θ = min(kth_a, kth_b) re-anchors both samples to
  *    a shared hash-space prefix);
  *  - a broadcast-vs-shuffle call from the dim side's estimated NDV;
  *  - a runtime-filter recommendation: if the estimated common keys
  *    are under half the fact side's NDV, a dim-key bloom filter
  *    prunes most fact rows before the shuffle (the q162 gate).
  *
  * Scale shape: NO global window — the k-min SETS materialize by
  * broadcasting each sketch's kth hash back as a filter (h ≤ kth),
  * so both passes are scans + one k×k sample join. Everything after
  * the two scans is sketch-sized. All estimator arithmetic is the
  * integer form the q160/q175 oracles replay.
  */
object JoinAdvisor {

  private val TwoPow60 = 1L << 60

  /** One-row advice for the equi-join `a.keyA = b.keyB`. `b` is the
    * dimension-candidate side. */
  def advise(
      a: DataFrame, keyA: Column, b: DataFrame, keyB: Column,
      label: String, k: Int = 128,
      broadcastNdvLimit: Long = 1000L): DataFrame = {
    def hashed(df: DataFrame, key: Column) =
      df.select(Dedup.hash60(concat(lit("ja|"), key.cast("string"))).as("h"))
        .distinct()
    val ha = hashed(a, keyA)
    val hb = hashed(b, keyB)
    def sk(df: DataFrame, t: String) =
      df.agg(Sketches.kmvDistinct(col("h"), k).as("s"))
        .select(col("s.est_distinct").as(s"ndv_$t"),
          col("s.kth_hash").as(s"kth_$t"))
    val stats = sk(ha, "a").crossJoin(sk(hb, "b"))
      .withColumn("theta", least(col("kth_a"), col("kth_b")))
    // k-min sets WITHOUT a global window: the kth hash broadcasts back
    // as a filter over the distinct-key scan
    val ka = ha.crossJoin(broadcast(stats.select(col("kth_a"))))
      .where(col("h") <= col("kth_a")).select(col("h"))
    val kb = hb.crossJoin(broadcast(stats.select(col("kth_b"))))
      .where(col("h") <= col("kth_b")).select(col("h").as("h2"))
    val sample = ka.join(kb, col("h") === col("h2"))
      .crossJoin(broadcast(stats.select(col("theta"))))
      .where(col("h") < col("theta"))
      .agg(count(lit(1)).as("sample_inter"))
    stats.crossJoin(broadcast(sample))
      // multiply BEFORE the integral divide, widened through DECIMAL so
      // sample_inter · 2^60 cannot overflow Long: dividing first
      // truncates the 2^60/θ factor to an integer (θ in the upper hash
      // space → factor 1.x rounds to 1, underestimating common keys by
      // up to ~50% and potentially flipping the runtime-filter call)
      .withColumn("est_common_keys",
        expr(s"CAST((CAST(sample_inter AS DECIMAL(38,0)) * " +
          s"CAST($TwoPow60 AS DECIMAL(38,0))) div " +
          s"CAST(theta AS DECIMAL(38,0)) AS BIGINT)"))
      .select(lit(label).as("join_key"),
        col("ndv_a"), col("ndv_b"), col("sample_inter"), col("est_common_keys"),
        when(col("ndv_b") <= broadcastNdvLimit, "broadcast")
          .otherwise("shuffle").as("strategy"),
        (col("est_common_keys") * 2 < col("ndv_a")).as("runtime_filter"))
  }
}
