package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sessionization — the
  * bookkeeping operators of a training-data pipeline.
  *
  * Split assignment must be a pure function of the record id: random
  * sampling re-deals the corpus every run (train/eval contamination as
  * data grows), and partition-based sampling changes with cluster
  * layout. Hashing the id into fixed basis-point ranges gives the
  * stability property production pipelines rely on: a document's split
  * never changes when the corpus around it does.
  */
object Sampling {

  /** Assign each row a named split by id hash. `splits` are
    * (name, basis_points) summing to ≤ 10000; ranges are allocated in
    * the given order, remainder rows get the last split. The salt
    * decorrelates independent splitting decisions over the same ids
    * (e.g. a 1% eval carve-out inside an 80/20 split).
    * Engine-portable: hash60 is the md5-prefix hash with an exact SQL
    * mirror, so an oracle can re-derive every assignment. */
  def assignSplits(
      df: DataFrame, id: Column, salt: String,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 10000,
      "split basis points must sum to <= 10000")
    val bucket = pmod(Dedup.hash60(concat(lit(salt), lit("|"), id.cast("string"))),
      lit(10000L))
    val bounds = splits.scanLeft(0) { case (acc, (_, bp)) => acc + bp }
    val expr = splits.zipWithIndex.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), i)) =>
        when(bucket >= bounds(i) && bucket < bounds(i + 1), lit(name))
          .otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Gap-based sessionization: events of one key belong to the same
    * session while consecutive gaps stay ≤ `maxGap` (same time unit as
    * `ts`). One window shuffle keyed on `key`: the session index is a
    * running sum of gap-break flags — no self-join, no state blow-up;
    * at 100 TB this is the standard single-exchange sessionizer
    * (skewed power-users bound the per-key sort, not the cluster).
    * Adds `session_idx` (0-based per key). */
  def sessionize(
      df: DataFrame, key: Column, ts: Column, maxGap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(ts)
    val gapBreak = when(
      lag(ts, 1).over(w).isNull || ts - lag(ts, 1).over(w) <= maxGap, 0L)
      .otherwise(1L)
    df.withColumn("session_idx",
      sum(gapBreak).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Mixture-planned stratified sample: allocate a document budget
    * across strata (languages / source domains) by temperature-scaled
    * token mass — w_s = sqrt(tokens_s) / Σ sqrt(tokens) — then pick each
    * stratum's quota deterministically by smallest salted id-hash
    * (a keyed "reservoir" that never re-deals as the corpus grows:
    * a kept document stays kept unless enough new smaller hashes arrive).
    *
    * sqrt IS the temperature (α = 0.5): IEEE sqrt is correctly rounded
    * in every engine, so the weights are reproducible bit-for-bit where
    * pow(x, α) would not be.
    *
    * Scale shape: stratum stats are one aggregate collapsing to
    * #strata rows (broadcast); the quota selection pre-filters with a
    * hash-space threshold — hash < 4·quota/count of the 60-bit space —
    * so the per-stratum sort ranks ~4·quota survivors, not the whole
    * stratum (the window never sees more than a sliver of a 100 TB
    * corpus; the filter is part of the operator's spec, mirrored by
    * oracles, so exactness is unconditional).
    *
    * Returns kept docs: (id, stratum, stratum_docs, stratum_tokens,
    * quota, pick_rank). */
  def mixtureSample(
      df: DataFrame, id: Column, stratum: Column, tokens: Column,
      salt: String, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("_id"), stratum.as("stratum"),
      tokens.cast("long").as("_tok"))
    val strata = base.groupBy("stratum")
      .agg(count(lit(1)).as("stratum_docs"), sum(col("_tok")).as("stratum_tokens"))
    val total = strata.agg(
      sum(sqrt(col("stratum_tokens").cast("double"))).as("_tot"))
    val quotas = strata.crossJoin(broadcast(total))
      .withColumn("quota", floor(
        lit(budget.toDouble) * sqrt(col("stratum_tokens").cast("double")) /
          col("_tot") + lit(0.5)).cast("long"))
      .withColumn("_thr", floor(least(lit(1.0),
        lit(4.0) * col("quota").cast("double") / col("stratum_docs").cast("double")) *
        lit(1152921504606846976.0)).cast("long"))
      .drop("_tot")
    val hashed = base.withColumn("_h",
      Dedup.hash60(concat(lit(salt), lit("|"), col("_id").cast("string"))))
      .join(broadcast(quotas), "stratum")
      .where(col("_h") < col("_thr"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("_h"), col("_id"))
    hashed
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .where(col("pick_rank") <= col("quota"))
      .select(col("_id").as("id"), col("stratum"), col("stratum_docs"),
        col("stratum_tokens"), col("quota"), col("pick_rank"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): each record draws an
    * exponential arrival key −ln(u)/weight from a deterministic salted
    * hash u ∈ (0,1]; the m smallest keys per stratum are EXACTLY a
    * weighted sample without replacement (record i enters with the
    * inclusion probabilities of sequential weighted draws). One
    * projection plus one per-stratum top-m window — the distributed
    * form needs no reservoir state, and merging partitions is just
    * min-k, so the same keys ride a streaming or map-side-combine
    * variant unchanged.
    *
    * Determinism contract: u is hash-derived (same record → same draw
    * on any engine/retry), keys round through DECIMAL(28,9) before
    * ranking (ln/division libm ulps live far below the grain), ties
    * break on id. Weight ≤ 0 rows are excluded (they cannot be drawn).
    * Returns (id, stratum, weight, key, pick_rank ≤ m). */
  def weightedSample(
      df: DataFrame, id: Column, stratum: Column, weight: Column,
      salt: String, m: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val twoPow60 = 1152921504606846976.0 // 2^60
    val base = df.select(id.as("id"), stratum.as("stratum"),
      weight.cast("double").as("weight"))
      .where(col("weight") > 0)
    val u = (Dedup.hash60(concat(lit(salt), lit("|"), col("id").cast("string")))
      .cast("double") + lit(1.0)) / lit(twoPow60)
    val keyed = base.withColumn("key",
      (-log(u) / col("weight")).cast("decimal(28,9)"))
      // a sub-~1e-17 weight overflows DECIMAL(28,9) to NULL (Spark
      // non-ANSI cast); with default nulls-first ordering that row
      // would be picked AHEAD of every valid key. Drop it instead: an
      // arrival key past 1e19 means a draw probability so small it is
      // zero at any realistic sample size, so exclusion is the correct
      // limit behavior (and nulls-last on the window backstops it).
      .where(col("key").isNotNull)
    val w = Window.partitionBy("stratum")
      .orderBy(col("key").asc_nulls_last, col("id").asc)
    keyed.withColumn("pick_rank", row_number().over(w).cast("long"))
      .where(col("pick_rank") <= m)
  }

  /** Deterministic systematic resampling (stochastic-universal sampling
    * with the jitter pinned at 0.5): draw exactly `m` copies from the
    * corpus with per-doc multiplicity proportional to an INTEGER
    * weight. Doc i with cumulative weight C_i out of total T receives
    * #{k in [0,m) : (k+0.5)/m in [C_{i-1}/T, C_i/T)} copies — ALL
    * integer arithmetic ((2k+1)·T < 2·m·C_i rearranged into a
    * non-negative integer division), so any engine reproduces the
    * counts bit-for-bit; no floating-point CDF can drift a copy across
    * a boundary. Σ n_copies = m exactly, weight-0 docs get 0.
    *
    * The cumulative weight reuses Packing's two-phase prefix sum
    * (per-bucket window + tiny bucket-offset frame) so no corpus-wide
    * ordered window exists. Guard for 100 TB: 2·m·T must stay inside
    * Long — with m ≤ 1e6 and T ≤ 1e12 that holds with margin.
    *
    * Returns (doc_id, w, n_copies) for every input doc (n_copies may
    * be 0). */
  def systematicResample(
      df: DataFrame, id: Column, weight: Column, m: Long,
      bucketSize: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(id.as("doc_id"),
      greatest(weight.cast("long"), lit(0L)).as("w"))
    val bucketed = base.withColumn("bucket",
      floor(col("doc_id") / lit(bucketSize)).cast("long"))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acrossBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = bucketed.groupBy("bucket").agg(sum(col("w")).as("btotal"))
      .withColumn("bprefix", sum(col("btotal")).over(acrossBuckets) - col("btotal"))
    val total = offs.agg(sum(col("btotal")).as("t"))
    def copiesBelow(c: String): Column =
      least(lit(m), expr(s"(greatest(2 * $m * $c - t, 0L) + 2 * t - 1) div (2 * t)"))
    bucketed
      .withColumn("run", sum(col("w")).over(inBucket))
      .join(broadcast(offs.select("bucket", "bprefix")), Seq("bucket"))
      .crossJoin(broadcast(total))
      .withColumn("c", col("bprefix") + col("run"))
      .withColumn("cprev", col("c") - col("w"))
      .select(col("doc_id"), col("w"),
        (copiesBelow("c") - copiesBelow("cprev")).as("n_copies"))
  }

  /** Data-constrained epoch planner (Muennighoff et al. 2023: when the
    * best data runs out, REPEAT it — up to ~4 epochs — before reaching
    * for lower tiers). Tiers fill the token budget in ascending `tier`
    * order (0 = best): each takes up to `maxEpochs` full epochs of its
    * token mass; the first tier the budget cannot cover takes a PARTIAL
    * epoch — the hash-smallest documents that fit, a pure function of
    * the ids — and every tier after it gets nothing.
    *
    * The greedy recurrence collapses to closed form
    * (used_t = clamp(budget − Σ_{s<t} maxEpochs·m_s, 0, maxEpochs·m_t)),
    * so the tier plan is one tiny aggregate + prefix window broadcast
    * back, and partial-epoch membership is the hash-bucketed two-phase
    * prefix sum inside the single partial tier (never a corpus-wide
    * ordered window). All integer arithmetic — exactly replayable.
    *
    * @param toks (doc_id: long, n_tokens: long, tier: int)
    * @return (doc_id, tier, n_tokens, epochs, in_partial,
    *          planned_tokens = epochs·n_tokens (+ n_tokens if partial)) */
  def epochPlan(toks: DataFrame, budget: Long, maxEpochs: Int, salt: String,
      bucketBits: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxEpochs > 0 && budget >= 0, "epochPlan: bad budget/maxEpochs")
    val masses = toks.groupBy("tier").agg(sum(col("n_tokens")).as("m"))
    val before = Window.orderBy(col("tier"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val plan = masses
      .withColumn("prefix_full",
        coalesce(sum(col("m") * maxEpochs).over(before), lit(0L)))
      .withColumn("used", least(col("m") * maxEpochs,
        greatest(lit(budget) - col("prefix_full"), lit(0L))))
      // a zero-mass tier (all docs empty) must plan 0 epochs, not
      // null-divide and silently drop its docs at the join below
      .withColumn("epochs",
        when(col("m") > 0, expr("used div m")).otherwise(lit(0L)))
      .withColumn("partial_tokens", col("used") - col("epochs") * col("m"))
      .select("tier", "epochs", "partial_tokens")
    val h = Dedup.hash60(concat_ws("|", lit(salt), col("doc_id").cast("string")))
    val hashed = toks.join(broadcast(plan), "tier")
      .withColumn("h", h)
      .withColumn("bucket", (col("h") / lit(1L << (60 - bucketBits))).cast("long"))
    // partitioned = true: each tier's partial-epoch fill is an
    // independent hash-ordered prefix sum
    Packing.twoPhaseRunning(hashed, Seq("tier"), "bucket",
        Seq("h", "doc_id"), "n_tokens", partitioned = true)
      .withColumn("in_partial",
        col("partial_tokens") > 0 &&
          (col("__bprefix") + col("__run")) <= col("partial_tokens"))
      .select(col("doc_id"), col("tier"), col("n_tokens"), col("epochs"),
        col("in_partial"),
        (col("epochs") * col("n_tokens") +
          when(col("in_partial"), col("n_tokens")).otherwise(lit(0L)))
          .as("planned_tokens"))
  }

  /** DoReMi-style mixture reweighting (Xie et al. 2023, Algorithm 1's
    * exponentiated-gradient step): domains whose measured loss exceeds
    * the reference's get up-weighted multiplicatively, then the
    * distribution is smoothed toward uniform — one EG step over a
    * (domain, excess_loss) frame, plus a largest-remainder integer
    * allocation of a document budget under the new weights.
    *
    * Cross-engine float discipline (the q150 idiom, tightened):
    * excess clamps at 0 and quantizes to 4 dp BEFORE exp, so both
    * engines exponentiate identical doubles; exp output quantizes
    * through DECIMAL(20,8) (the one op where libm and the JVM may
    * differ by an ulp — killed at the quantum, not at the gate);
    * the normalizer is an EXACT decimal sum (order-independent across
    * partitions), and the final division/smoothing runs on
    * bit-identical doubles. The allocation is pure decimal/integer
    * arithmetic: share = w₆·budget exactly, floor + signed
    * largest-remainder correction (quantized weights may sum to
    * 1 ± 1e-5, so the leftover can be negative — the correction
    * subtracts from the smallest remainders then), Σ n_alloc ≡ budget.
    *
    * Scale shape: everything after the caller's per-domain loss
    * aggregation is domain-cardinality-sized — the two windows rank
    * O(domains) rows; nothing here ever touches documents.
    *
    * Returns (domain, excess, weight, n_alloc). */
  def doremiReweight(domainExcess: DataFrame, eta: Double,
      smoothing: Double, budget: Long): DataFrame = {
    require(smoothing >= 0 && smoothing < 1, s"smoothing: $smoothing")
    require(budget >= 0, s"budget: $budget")
    import org.apache.spark.sql.expressions.Window
    val q = domainExcess.select(col("domain"),
      greatest(col("excess"), lit(0.0)).cast("decimal(12,4)").cast("double")
        .as("excess"))
    val expd = q.withColumn("_e",
      exp(lit(eta) * col("excess")).cast("decimal(20,8)"))
    val norm = broadcast(expd.agg(sum(col("_e")).as("_s"),
      count(lit(1)).as("_k")))
    val w6 = expd.crossJoin(norm)
      .withColumn("_w",
        (lit(1.0 - smoothing) * (col("_e").cast("double") / col("_s").cast("double")) +
          lit(smoothing) / col("_k").cast("double")).cast("decimal(18,6)"))
    val alloc = w6
      .withColumn("_share", col("_w") * lit(budget))
      .withColumn("_base", floor(col("_share")).cast("long"))
      .withColumn("_rem", col("_share") - col("_base"))
    val left = broadcast(alloc.agg((lit(budget) - sum(col("_base"))).as("_left")))
    val up = Window.orderBy(col("_rem").desc, col("domain").asc)
    val down = Window.orderBy(col("_rem").asc, col("domain").desc)
    alloc.crossJoin(left)
      .withColumn("_ru", row_number().over(up).cast("long"))
      .withColumn("_rd", row_number().over(down).cast("long"))
      .withColumn("n_alloc",
        col("_base") +
          when(col("_left") > 0 && col("_ru") <= col("_left"), lit(1L))
            .when(col("_left") < 0 && col("_rd") <= -col("_left"), lit(-1L))
            .otherwise(lit(0L)))
      .select(col("domain"), col("excess"),
        col("_w").cast("double").as("weight"), col("n_alloc"))
  }

  /** Neyman-style OPTIMAL stratified allocation in exact integer
    * arithmetic: stratum h gets a share of `budget` proportional to
    * its dispersion mass D_h = Σ|v − median_h| (total absolute
    * deviation from the stratum's exact lower median — the integer
    * robust analogue of Neyman's N_h·σ_h; classic proportional
    * allocation oversamples big LOW-VARIANCE strata, Neyman puts the
    * budget where the estimator variance actually is). Quotas are
    * floor(budget·D_h / ΣD_h) topped up by LARGEST REMAINDER
    * (budget·D_h mod ΣD_h, ties by stratum key) so Σ quota = budget
    * exactly and every step is BIGINT — no float share ever computed.
    * The remainder window runs over the strata frame (tiny by
    * definition). A stratum with zero dispersion gets quota 0 unless
    * remainders reach it; if EVERY stratum is constant-valued (total
    * dispersion 0), allocation falls back to row-proportional — which
    * is Neyman's own answer when no variance signal exists to weight
    * by (and avoids a divide-by-zero null quota). Quotas are NOT
    * capped by stratum size —
    * callers with budget ≳ any stratum's row count cap downstream.
    * Returns (stratum, n_rows, median, dispersion, quota). */
  def neymanAllocation(df: DataFrame, stratum: Column, value: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget: $budget")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(stratum.as("g"), value.cast("long").as("v"))
    val med = Quantiles.histMedian(base, col("g"), col("v"))
    val disp = base.join(broadcast(med.select(col("g"), col("med"))), "g")
      .groupBy("g")
      .agg(sum(abs(col("v") - col("med"))).as("disp"),
        count(lit(1)).as("_n"))
    val tot = broadcast(disp.agg(sum(col("disp")).as("tot"),
      sum(col("_n")).as("_ntot")))
    // zero total dispersion (every stratum constant-valued) would make
    // the quota arithmetic divide by zero — fall back to classic
    // row-proportional allocation, which IS Neyman's answer when no
    // stratum has any variance signal to weight by
    val quota = disp.crossJoin(tot)
      .withColumn("_mass", when(col("tot") > 0L, col("disp"))
        .otherwise(col("_n")))
      .withColumn("_mtot", when(col("tot") > 0L, col("tot"))
        .otherwise(col("_ntot")))
      .withColumn("_base", expr(s"($budget * _mass) div _mtot"))
      .withColumn("_rem", expr(s"($budget * _mass) % _mtot"))
    val left = broadcast(quota.agg((lit(budget) - sum(col("_base"))).as("_left")))
    quota.crossJoin(left)
      .withColumn("_ru", row_number().over(
        Window.orderBy(col("_rem").desc, col("g").asc)).cast("long"))
      .withColumn("quota", col("_base") +
        when(col("_ru") <= col("_left"), 1L).otherwise(0L))
      .join(med.select(col("g"), col("n"), col("med")), "g")
      .select(col("g").as("stratum"), col("n").as("n_rows"),
        col("med").as("median"), col("disp").as("dispersion"), col("quota"))
  }

  /** Draw the [[neymanAllocation]] sample deterministically: rows rank
    * within their stratum by the salted id hash (a pure function of
    * the id — the [[assignSplits]] stability property: a row's
    * membership never changes when other strata grow) and the top
    * `quota` per stratum are kept. The rank window is bounded to the
    * constant `budget` FIRST (rank ≤ budget plans as a per-partition
    * top-k heap under WindowGroupLimit — never a full per-stratum
    * sort survives), then trimmed to the per-stratum quota.
    * Returns input rows + (rk) for the selected rows. */
  def neymanSample(df: DataFrame, stratum: Column, value: Column,
      id: Column, budget: Long, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val alloc = neymanAllocation(df, stratum, value, budget)
      .select(col("stratum").as("__g"), col("quota"))
    val ranked = df.withColumn("__g", stratum)
      .withColumn("__h", Dedup.hash60(
        concat(lit(s"$salt|"), id.cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__h"), id)).cast("long"))
      .where(col("rk") <= budget)
    ranked.join(broadcast(alloc), "__g")
      .where(col("rk") <= col("quota"))
      .drop("__g", "__h", "quota")
  }
}
