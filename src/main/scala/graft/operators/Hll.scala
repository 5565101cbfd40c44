package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch in ENGINE-PORTABLE arithmetic —
  * the industry-standard per-group cardinality estimator (Flajolet et
  * al. 2007; the sketch behind Spark's `approx_count_distinct`,
  * Redis PFCOUNT, BigQuery HLL_COUNT) rebuilt on the house rules:
  * every step is exact integer arithmetic over [[Dedup.hash60]], so
  * registers and the harmonic numerator are bit-identical on any
  * engine and any partitioning — unlike the built-in (random-seeded,
  * opaque sketch bytes), the whole state is oracle-replayable.
  *
  * Construction (p index bits, m = 2^p registers):
  *  - register index = hash60(key) mod m; suffix s = hash60 div m
  *    (60 − p bits);
  *  - ρ(s) = trailing zeros of s, + 1 — the trailing-zero HLL variant
  *    (identical statistics to leading zeros, and one line of
  *    portable bit arithmetic: `bit_count((s & -s) − 1) + 1`); the
  *    all-zero suffix takes the sentinel ρ = 60 − p + 1;
  *  - register value M_j = MAX ρ — commutative, idempotent,
  *    map-side combinable; two sketches MERGE by the same max, which
  *    is what makes the sketch maintainable incrementally and
  *    shardable across days/partitions (spec-gated).
  *
  * The harmonic mean needs Σ 2^(−M_j); scaled by 2^R with
  * R = 60 − p + 1 it becomes the INTEGER Σ 2^(R − M_j), bounded by
  * m·2^R = 2^61 — it fits a BIGINT at every p, so the numerator is
  * exact and portable, and the only float op is the final
  * α·m²·2^R / num division (deterministic IEEE from exact integers).
  *
  * Scale shape: one (group, register) max aggregate + one per-group
  * fold — state is O(m) per group regardless of row count, the
  * defining property; beside [[graft.functions.Sketches.kmvDistinct]]
  * (exact below k, order-statistic above) this is the fixed-memory
  * arm of the distinct-count family.
  */
object Hll {

  /** Per-group HLL report over `key`. Returns one row per group:
    * (grp, n_registers_set, register_sum, harmonic_num, est_distinct)
    * — `harmonic_num` is the exact scaled integer Σ 2^(R − M_j)
    * (empty registers contribute 2^R each), `est_distinct` the
    * standard-bias-corrected estimate rounded to 6 dp. `p` in [4, 16];
    * α branches to Flajolet's small-m constants at p ∈ {4, 5, 6}
    * (α₁₆ = 0.673, α₃₂ = 0.697, α₆₄ = 0.709) and the asymptotic
    * 0.7213/(1 + 1.079/m) form at m ≥ 128, so the estimate is
    * unbiased at EVERY admissible p (round-14 finding).
    *
    * TWO-RANGE estimator (round 16, fig. 3 of the paper): the raw
    * harmonic estimate overshoots badly when n ≪ m (254 empty
    * registers still contribute to the mean — raw E ≈ 180 for TWO
    * distinct keys at p = 8), so when raw E ≤ 2.5·m and empty
    * registers exist the estimate switches to LINEAR COUNTING,
    * E* = m·ln(m / V) with V = empty registers — which is what makes
    * the estimate shippable in a product document next to the exact
    * count (the statistics.json facet arm). Portability note: the
    * branch predicate compares the raw estimate (one IEEE division
    * from exact integers — bit-identical everywhere) against exact
    * 2.5·m, and ln's argument is the exact ratio m/V; JVM Math.log
    * and libm ln were verified to agree to 6 dp on EVERY possible
    * (p ≤ 15, V) argument, so the rounded estimate stays
    * engine-replayable at every gated p. (The 60-bit hash makes
    * large-range collision correction unnecessary.) */
  def groupDistinct(df: DataFrame, group: Column, key: Column,
      p: Int): DataFrame =
    report(registers(df, group, key, p), p)

  /** [[groupDistinct]]'s report half over a register frame — callers
    * that maintain sketches via [[registers]]/[[merge]] read the
    * estimate off the merged state with this. */
  def report(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val rMax = 60 - p + 1
    // Flajolet et al. 2007, fig. 3: the asymptotic α is only valid at
    // m ≥ 128; the paper's exact small-m constants take over below
    val alpha = m match {
      case 16L => 0.673
      case 32L => 0.697
      case 64L => 0.709
      case _   => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }
    regs.groupBy("grp").agg(
        count(lit(1)).as("n_registers_set"),
        sum(col("mreg")).as("register_sum"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($rMax - mreg AS INT))"))
          .as("_setnum"))
      .select(col("grp"), col("n_registers_set"), col("register_sum"),
        (col("_setnum") + (lit(m) - col("n_registers_set"))
          * lit(1L << rMax)).as("harmonic_num"))
      .withColumn("_raw",
        lit(alpha * m.toDouble * m.toDouble * math.pow(2.0, rMax))
          / col("harmonic_num").cast("double"))
      .withColumn("est_distinct",
        round(when(col("_raw") <= lit(2.5 * m.toDouble)
            && col("n_registers_set") < m,
          lit(m.toDouble) * log(lit(m.toDouble)
            / (lit(m.toDouble) - col("n_registers_set").cast("double"))))
          .otherwise(col("_raw")), 6))
      .drop("_raw")
  }

  /** The raw (grp, reg, mreg) register frame — the MERGEABLE state
    * behind [[groupDistinct]], exposed so callers can persist a
    * sketch per shard/day and union+max-merge later ([[merge]]). */
  def registers(df: DataFrame, group: Column, key: Column,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p: $p")
    val m = 1L << p
    val rMax = 60 - p + 1
    df.select(group.as("grp"), Dedup.hash60(key.cast("string")).as("_h"))
      .select(col("grp"), pmod(col("_h"), lit(m)).as("reg"),
        expr(s"_h div $m").as("_s"))
      .withColumn("rho",
        when(col("_s") === 0L, lit(rMax.toLong))
          .otherwise(expr("CAST(bit_count((_s & -_s) - 1) AS BIGINT) + 1")))
      .groupBy("grp", "reg").agg(max(col("rho")).as("mreg"))
  }

  /** Merge register frames (same p) by per-register max — the HLL
    * union. Exactly equals building one sketch over the row union. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("grp", "reg").agg(max(col("mreg")).as("mreg"))
}
