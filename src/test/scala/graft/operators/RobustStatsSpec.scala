package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-14 operators: exact histogram order statistics (median/MAD),
  * Neyman allocation arithmetic, weighted SSSP relaxation, personalized
  * PageRank mass conservation, and the clustering-depth sweep — each on
  * hand-checked fixtures the big oracle fixtures cannot isolate. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("histMedian: lower median on odd/even counts and one-value groups") {
    val df = Seq(("a", 1L), ("a", 5L), ("a", 9L), // odd: med 5
      ("b", 1L), ("b", 2L), ("b", 8L), ("b", 9L), // even: lower med 2
      ("c", 7L), ("c", 7L), ("c", 7L)) // degenerate
      .toDF("g", "v")
    val r = Quantiles.histMedian(df, col("g"), col("v"))
      .orderBy("g").collect().toSeq
    assert(r === Seq(Row("a", 3L, 5L), Row("b", 4L, 2L), Row("c", 3L, 7L)))
  }

  test("medianMad: MAD is the lower median of absolute deviations") {
    // g: values 1,2,4,10 -> lower med 2; |v-2| = 1,0,2,8 -> lower MAD 1
    val df = Seq(("g", 1L), ("g", 2L), ("g", 4L), ("g", 10L)).toDF("g", "v")
    val r = Quantiles.medianMad(df, col("g"), col("v")).head()
    assert(r === Row("g", 4L, 2L, 1L))
  }

  test("neymanAllocation: quotas sum to budget, dispersion-proportional") {
    // stratum a: 1,1,1 (disp 0); b: 0,10 (med 0, disp 10); c: 0,5 (disp 5)
    val df = Seq(("a", 1L), ("a", 1L), ("a", 1L),
      ("b", 0L), ("b", 10L), ("c", 0L), ("c", 5L)).toDF("s", "v")
    val r = Sampling.neymanAllocation(df, col("s"), col("v"), budget = 9L)
      .orderBy("stratum").collect().toSeq
    // tot disp 15: a -> 0, b -> 90/15 = 6, c -> 45/15 = 3; no remainder
    assert(r.map(x => (x.getString(0), x.getLong(4))) ===
      Seq(("a", 0L), ("b", 6L), ("c", 3L)))
    assert(r.map(_.getLong(4)).sum === 9L)
    // remainder path: budget 10 -> floors 0/6/3 leave 1; remainders
    // (10*disp mod 15) = 0, 10, 5 -> b gets the top-up
    val r2 = Sampling.neymanAllocation(df, col("s"), col("v"), budget = 10L)
      .orderBy("stratum").collect().toSeq
    assert(r2.map(x => (x.getString(0), x.getLong(4))) ===
      Seq(("a", 0L), ("b", 7L), ("c", 3L)))
  }

  test("neymanAllocation: zero total dispersion falls back to row shares") {
    // every stratum constant-valued: no variance signal anywhere ->
    // row-proportional allocation, never a divide-by-zero null quota
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("b", 9L)).toDF("s", "v")
    val r = Sampling.neymanAllocation(df, col("s"), col("v"), budget = 8L)
      .orderBy("stratum").collect().toSeq
    assert(r.map(x => (x.getString(0), x.getLong(4))) ===
      Seq(("a", 6L), ("b", 2L)))
  }

  test("neymanSample: exactly quota rows per stratum, hash-stable") {
    val df = (1L to 100L).map(i => (if (i <= 50) "a" else "b", i, i % 7))
      .toDF("s", "id", "v")
    val out = Sampling.neymanSample(df, col("s"), col("v"), col("id"),
      budget = 20L, salt = "t")
    val per = out.groupBy("s").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.values.sum === 20L)
    // stability: the a-side selection is unchanged when b grows
    val grown = df.unionByName(
      (101L to 160L).map(i => ("b", i, i % 7)).toDF("s", "id", "v"))
    val aIds = out.filter(col("s") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    val aIds2 = Sampling.neymanSample(grown, col("s"), col("v"), col("id"),
        budget = 20L, salt = "t")
      .filter(col("s") === "a").select("id")
      .collect().map(_.getLong(0)).toSet
    // same quota arithmetic inputs for stratum a (same disp share)
    // need not hold as b's dispersion changed — but the RANK ORDER of
    // a's rows is a pure function of their ids: the selected set is a
    // prefix of the same ordering, so one is a subset of the other
    assert(aIds.subsetOf(aIds2) || aIds2.subsetOf(aIds))
  }

  test("neymanSample plan-lock: rank bounds as a WindowGroupLimit heap") {
    val df = (1L to 100L).map(i => (if (i <= 50) "a" else "b", i, i % 7))
      .toDF("s", "id", "v")
    val plan = Sampling.neymanSample(df, col("s"), col("v"), col("id"),
      budget = 20L, salt = "t").queryExecution.executedPlan.toString
    // the constant-budget rank filter must plan as WindowGroupLimit
    // (per-partition top-k heaps around the exchange), so no full
    // per-stratum sort ever materializes
    assert("WindowGroupLimit".r.findAllIn(plan).size >= 1, plan.take(900))
  }

  test("weightedDistances: 2-hop path beats the direct edge") {
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L),
      (2L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r = Centrality.weightedDistances(edges, seeds, maxHops = 3)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(r === Map(2L -> 5L, 3L -> 2L, 4L -> 6L)) // 1->3->2 = 5 < 10
  }

  test("weightedDistances: bounded rounds stop improving past maxHops") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val r = Centrality.weightedDistances(edges, Seq(1L).toDF("id"), 2)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    assert(r === Map(2L -> 1L, 3L -> 2L)) // node 4 unreached in 2 hops
  }

  test("personalizedPageRank: mass conserves and teleports to seeds") {
    // directed star 1->10, 2->10; seeds {1}; suppliers dangling
    val edges = Seq((1L, 10L), (2L, 10L)).toDF("src", "dst")
    val scale = 1000000L
    val r = Centrality.personalizedPageRank(edges, Seq(1L).toDF("id"),
        rounds = 2, scale = scale)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    // r0: 1 -> 1e6. round 1: contrib 10 <- 850000; teleport 150000 + dang 0
    assert(r.keySet === Set(1L, 2L, 10L))
    // round 2: dangling (10) returns 85% of 850000 to seed 1 plus teleport
    assert(r(1L) === 150000L + 722500L)
    assert(r(2L) === 0L)
    assert(r(10L) === 127500L) // 85% of round-1 seed rank 150000
  }

  test("histExactQuantiles: rational targets hit exact order statistics") {
    // 10 values 1..10: p25 -> ceil(10/4)=3rd -> 3; p50 -> 5th -> 5;
    // p75 -> ceil(30/4)=8th -> 8; p100 -> 10th -> 10
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val r = Quantiles.histExactQuantiles(df, col("g"), col("v"),
        Seq((1, 4), (1, 2), (3, 4), (1, 1)))
      .orderBy("qden", "qnum")
      .select("qnum", "qden", "value").collect().toSeq
    assert(r === Seq(Row(1, 1, 10L), Row(1, 2, 5L),
      Row(1, 4, 3L), Row(3, 4, 8L)))
    // duplicates: 1,1,1,9 -> p75 target ceil(3)=3rd -> 1
    val dup = Seq(1L, 1L, 1L, 9L).map(("g", _)).toDF("g", "v")
    val r2 = Quantiles.histExactQuantiles(dup, col("g"), col("v"),
      Seq((3, 4))).select("value").head()
    assert(r2 === Row(1L))
  }

  test("shortestPathCounts: diamond graph multiplies path counts") {
    // 1 -> {2,3} -> 4 -> 5: node 4 has 2 shortest paths, node 5 inherits
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Centrality.shortestPathCounts(edges, Seq(1L).toDF("id"), 3)
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r === Map(2L -> (1L, 1L), 3L -> (1L, 1L),
      4L -> (2L, 2L), 5L -> (3L, 2L)))
    // a longer re-reach of an already-closed node adds nothing:
    // add 1 -> 4 direct, now 4 is at dist 1 with 1 path and 5 at 2
    val r2 = Centrality.shortestPathCounts(
        edges.unionByName(Seq((1L, 4L)).toDF("src", "dst")),
        Seq(1L).toDF("id"), 3)
      .collect().map(x => x.getLong(1) -> (x.getLong(2), x.getLong(3))).toMap
    assert(r2(4L) === (1L, 1L) && r2(5L) === (2L, 1L))
  }

  test("bestThresholdGate: exact argmax, both orientations, tie rules") {
    // v<=2 separates positives {1,2} from negatives {3,4}: agree 4/4
    val df = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "y")
    val r = Eval.bestThresholdGate(df, col("v"), col("y")).head()
    assert(r === Row(2L, true, 4L, 2L, 4L, 2L))
    // inverted labels -> same threshold, orientation flips
    val inv = Eval.bestThresholdGate(df, col("v"), !col("y")).head()
    assert(inv === Row(2L, false, 4L, 2L, 4L, 2L))
    // uninformative values: best equals the majority baseline
    val flat = Seq((7L, true), (7L, false), (7L, false)).toDF("v", "y")
    val r3 = Eval.bestThresholdGate(flat, col("v"), col("y")).head()
    assert(r3.getLong(4) === 2L && r3.getLong(5) === 2L)
  }

  test("NULL values drop at entry: histMedian n and bestThresholdGate " +
      "counts see only non-null rows (round-14 advisory)") {
    // a NULL value must neither shift cumulative counts (Spark sorts
    // NULLS FIRST, DuckDB NULLS LAST) nor surface as a threshold/median
    val withNulls = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", null), ("a", 3L), ("a", 5L), ("a", null))
      .toDF("g", "v")
    val med = Quantiles.histMedian(withNulls, col("g"), col("v")).head()
    assert(med === Row("a", 3L, 3L)) // n = 3 non-null, median 3
    val gated = Seq[(java.lang.Long, java.lang.Boolean)](
      (1L, true), (2L, true), (null, true), (3L, false), (4L, null))
      .toDF("v", "y")
    val g = Eval.bestThresholdGate(gated, col("v"), col("y")).head()
    // only the 3 fully-labeled rows count: v<=2 agrees 3/3
    assert(g === Row(2L, true, 3L, 2L, 3L, 2L))
  }

  test("equiDepthPlan: skewed keys still yield equal-row files") {
    // quadratically spaced keys: equi-WIDTH files would be wildly
    // unbalanced; equi-depth must put exactly 250 rows in each
    val df = (1L to 1000L).map(i => Tuple1(i * i)).toDF("k")
    val man = Layout.equiDepthPlan(df, col("k"), files = 4)
      .orderBy("file_id").collect().toSeq
    assert(man.map(_.getLong(2)) === Seq(250L, 250L, 250L, 250L))
    // envelopes disjoint and ordered
    man.sliding(2).foreach { case Seq(a, b) =>
      assert(a.getLong(4) < b.getLong(3), s"$a !< $b")
    }
  }

  test("columnStats: distinct sets, null counting, honest cap overflow") {
    val df = Seq((0L, "A"), (0L, "B"), (0L, "A"), (0L, null),
      (1L, "C")).toDF("f", "v")
    val r = Layout.columnStats(df, col("f"), col("v"), maxDistinct = 16)
      .orderBy("file_id").collect().toSeq
    assert(r === Seq(Row(0L, 4L, 1L, "A,B"), Row(1L, 1L, 0L, "C")))
    // cap 1: file 0's set overflows -> null (unknown, cannot prune)
    val tight = Layout.columnStats(df, col("f"), col("v"), maxDistinct = 1)
      .orderBy("file_id").collect().toSeq
    assert(tight.head.isNullAt(3) && tight(1).getString(3) === "C")
  }

  test("rebalancePlan: splits, islands-bounded merges, interleave break") {
    // small [0,9], BIG [10,99], small [100,109], small [110,119]:
    // the big file must break the merge run — coalescing smalls across
    // it would create an envelope overlapping the big file
    val man = Seq(
      (1L, 10L, 0L, 9L), (2L, 100L, 10L, 99L),
      (3L, 10L, 100L, 109L), (4L, 10L, 110L, 119L))
      .toDF("file_id", "n_rows", "min_key", "max_key")
    val plan = Layout.rebalancePlan(man, targetRows = 30L)
      .orderBy("file_id").collect().toSeq
    val acts = plan.map(r => r.getLong(0) -> (r.getString(4), r.getLong(5),
      r.getLong(6))).toMap
    assert(acts(2L) === (("split", 4L, -1L))) // ceil(100/30)
    assert(acts(1L)._1 === "merge" && acts(3L)._1 === "merge")
    // file 1 is its own run; files 3 and 4 share one (and one subgroup)
    assert(acts(3L)._3 === acts(4L)._3)
    assert(acts(1L)._3 !== acts(3L)._3)
    // a run larger than target subdivides by start-offset prefix sum
    // (the incrementalOptimize packing rule: a group may overshoot by
    // at most one small file): before-sums 0,10,20,30 at target 25
    // -> subgroups 0,0,0,1
    val man2 = (1L to 4L).map(i =>
        (i, 10L, i * 100L, i * 100L + 9L))
      .toDF("file_id", "n_rows", "min_key", "max_key")
    val g = Layout.rebalancePlan(man2, targetRows = 25L)
      .orderBy("file_id").collect().map(_.getLong(6)).toSeq
    assert((g(0) === g(1)) && (g(1) === g(2)) && (g(2) !== g(3)))
  }

  test("clusteringDepth: hand-built overlapping envelopes") {
    // files: [0,9], [5,14], [20,29] -> depths: [0,5)=1 [5,10)=2
    // [10,15)=1 [15,20)=0(dropped) [20,30)=1
    val man = Seq((1L, 10L, 0L, 9L), (2L, 10L, 5L, 14L), (3L, 10L, 20L, 29L))
      .toDF("file_id", "n_rows", "min_key", "max_key")
    val r = Layout.clusteringDepth(man)
      .orderBy("depth").collect().toSeq
    assert(r === Seq(Row(1L, 3L, 20L), Row(2L, 1L, 5L)))
  }
}
