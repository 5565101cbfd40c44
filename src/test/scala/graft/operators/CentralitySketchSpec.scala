package graft.operators

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** KMV sketch + integer PageRank: exact-merge guarantees, plan shape
  * (partial aggregation — the property that makes the sketch a sketch),
  * and hand-checked fixpoint arithmetic including the dangling path the
  * oracle fixture cannot reach. */
class CentralitySketchSpec extends SparkSpec {
  import spark.implicits._

  test("kmv is exact below k and deterministic above") {
    val df = (1L to 40L).map(i => ("g", i * 1000L)).toDF("g", "h")
    val r = df.groupBy("g").agg(Sketches.kmvDistinct(col("h"), 64).as("s"))
      .select("s.est_distinct", "s.kth_hash", "s.n_kept").head()
    assert(r === Row(40L, 40000L, 40))
    // above k: estimator = (k-1) * 2^60 / h_k, integer division
    val big = (1L to 500L).map(i => ("g", i * 1000000L)).toDF("g", "h")
    val r2 = big.groupBy("g").agg(Sketches.kmvDistinct(col("h"), 64).as("s"))
      .select("s.est_distinct", "s.kth_hash", "s.n_kept").head()
    assert(r2.getInt(2) === 64)
    assert(r2.getLong(1) === 64000000L)
    assert(r2.getLong(0) === ((BigInt(63) << 60) / 64000000L).toLong)
  }

  test("kmv merge across partitions is bit-identical to one pass") {
    val rows = (1L to 5000L).map(i => (s"g${i % 3}", Some(i).filter(_ % 11 != 0).map(_ * 77L)))
    val df = rows.toDF("g", "h") // includes nulls (ignored) and dup-free hashes
    def run(parts: Int) =
      df.repartition(parts).groupBy("g")
        .agg(Sketches.kmvDistinct(col("h"), 32).as("s"))
        .select(col("g"), col("s.est_distinct"), col("s.kth_hash"), col("s.n_kept"))
        .collect().sortBy(_.getString(0)).toSeq
    assert(run(1) === run(16))
  }

  test("kmv aggregates with a partial (map-side) phase") {
    val df = (1L to 100L).map(i => ("g", i)).toDF("g", "h")
    val plan = df.groupBy("g").agg(Sketches.kmvDistinct(col("h"), 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(600))
    assert(plan.contains("partial_graft_kmv_sketch"), plan.take(1200))
  }

  test("pagerank on a star graph: hand-checked integer rounds") {
    // star: 1..4 -> 0 and back (bidirected), scale 10^6 for readable numbers
    val eo = (1L to 4L).map(i => (i, 0L))
    val edges = (eo ++ eo.map(_.swap)).toDF("src", "dst")
    val out = Centrality.pageRank(edges, rounds = 1, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // N=5, r0 = 200000 each. contrib leaf->center: (85*200000/100)/1 = 170000
    // center->each leaf: (85*200000/100)/4 = 42500; base = 150000/5 = 30000
    assert(out(0L) === 30000L + 4 * 170000L)
    (1L to 4L).foreach(i => assert(out(i) === 30000L + 42500L))
  }

  test("label propagation: two triangles + a bridge converge to two " +
      "communities with deterministic tie-breaks") {
    // triangles {1,2,3} and {10,11,12}, bridged 3–10, bidirected
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = Centrality.labelPropagation(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand-rolled synchronous rounds (max count, min label):
    // r1 {1:2, 2:1, 3:1, 10:3, 11:10, 12:10}
    // r2 {1:1, 2:1, 3:1, 10:10, 11:3, 12:3}
    // r3 {1:1, 2:1, 3:1, 10:3, 11:3, 12:3}
    assert(Seq(1L, 2L, 3L).forall(out(_) === 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) === 3L))
  }

  test("label propagation: converged flag is honest (kCorePeel pattern)") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // round 3 still flips node 10 (see the hand-rolled rounds above),
    // round 4 changes nothing — the flag must say so in both cases
    val r3 = Centrality.labelPropagation(edges, rounds = 3)
      .select("converged").distinct().collect().map(_.getBoolean(0))
    assert(r3.toSeq === Seq(false))
    val r4 = Centrality.labelPropagation(edges, rounds = 4)
      .select("converged").distinct().collect().map(_.getBoolean(0))
    assert(r4.toSeq === Seq(true))
  }

  test("earliest arrival: strictly increasing times, min-merge, " +
      "time-respecting rejection") {
    // 1→2@5; 2→3@3 (departs before arrival — unusable); 2→3@7 (usable);
    // 1→3@1 direct. Earliest at 3 is min(1, 7) = 1.
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 7L), (1L, 3L, 1L))
      .toDF("src", "dst", "t")
    val out = Centrality.earliestArrival(edges, Seq(1L).toDF("seed"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 2L)) === 5L)
    assert(out((1L, 3L)) === 1L)
    // without the direct edge and the @7 hop, 3 is UNREACHABLE in time
    // order even though a static path exists (1→2@5 then 2→3@3)
    val e2 = Seq((1L, 2L, 5L), (2L, 3L, 3L)).toDF("src", "dst", "t")
    val out2 = Centrality.earliestArrival(e2, Seq(1L).toDF("seed"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out2 === Set((1L, 2L)))
    // an exactly-equal time does NOT chain (strict increase)
    val e3 = Seq((1L, 2L, 5L), (2L, 3L, 5L)).toDF("src", "dst", "t")
    val out3 = Centrality.earliestArrival(e3, Seq(1L).toDF("seed"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out3 === Set((1L, 2L)))
  }

  test("pagerank redistributes dangling mass uniformly") {
    // 0 -> 1, 1 has no out-edges: 1's damped mass returns to both
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val out = Centrality.pageRank(edges, rounds = 1, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // N=2, r0=500000. dangling(1): 85*500000/100 = 425000 -> 212500 each.
    // base = 150000/2 = 75000. node0: base + dang; node1: + contrib 425000
    assert(out(0L) === 75000L + 212500L)
    assert(out(1L) === 75000L + 212500L + 425000L)
    // mass conservation up to floor loss
    assert(out.values.sum <= 1000000L && out.values.sum >= 1000000L - 10L)
  }

  test("triangle counts: K4 has four triangles, three per node; square has none") {
    val k4 = for (u <- 0L to 3L; v <- 0L to 3L if u < v) yield (u, v)
    val r = Centrality.triangleCounts(k4.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("u", "v")
    assert(Centrality.triangleCounts(square).count() === 0L)
    // duplicate / reversed / self edges do not change counts
    val noisy = (k4 ++ k4.map(_.swap) ++ Seq((1L, 1L))).toDF("u", "v")
    val r2 = Centrality.triangleCounts(noisy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === r)
  }

  test("hist quantiles: uniform values interpolate exactly, degenerate group safe") {
    val df = ((1 to 1000).map(i => ("u", i.toDouble)) ++ Seq(("c", 7.0), ("c", 7.0)))
      .toDF("g", "v")
    val out = Quantiles.histQuantiles(df, col("g"), col("v"),
        buckets = 100, qs = Seq(0.5, 0.99))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // uniform 1..1000: p50 estimate within one bucket width (~10) of 500
    assert(math.abs(out(("u", 0.5)) - 500.0) < 11.0, out.toString)
    assert(math.abs(out(("u", 0.99)) - 990.0) < 11.0, out.toString)
    // degenerate group (hi == lo) lands on the constant
    assert(out(("c", 0.5)) === 7.0 && out(("c", 0.99)) === 7.0)
  }

  test("binaryEval: hand-computed AUC with ties, metrics at threshold") {
    // scores: pos {3, 1, 1}, neg {1, -2}. Pairs = 6.
    // pos=3 beats both (2); each pos=1 beats -2 (1 each) and TIES the
    // neg=1 (0.5 each) -> U = 5, AUC = 5/6. u2 = 10.
    val df = Seq((3.0, true), (1.0, true), (1.0, true), (1.0, false), (-2.0, false))
      .toDF("score", "y")
    val r = Eval.binaryEval(df, col("score"), col("y")).head()
    assert(r.getAs[Long]("n_pos") === 3L && r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Long]("u2") === 10L)
    assert(math.abs(r.getAs[Double]("auc") - 5.0 / 6.0) < 1e-6)
    // threshold 0: tp=3 (all pos > 0), fp=1 (neg at 1), fn=0, tn=1
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) === ((3L, 1L, 0L, 1L)))
    assert(r.getAs[Double]("prec") === 0.75)
    assert(r.getAs[Double]("rec") === 1.0)
    // perfect separation -> AUC exactly 1
    val sep = Seq((2.0, true), (1.0, true), (-1.0, false)).toDF("score", "y")
    assert(Eval.binaryEval(sep, col("score"), col("y")).head()
      .getAs[Double]("auc") === 1.0)
  }

  test("rocPoints: reverse-cumulative counts and rates on a hand fixture") {
    // scores spread over [0, 31] with 4 buckets of width 8
    val rows = Seq((1.0, true), (2.0, false), (9.0, true), (17.0, false),
      (25.0, true), (31.0, true))
    val pts = Eval.rocPoints(rows.toDF("score", "y"), col("score"), col("y"),
        buckets = 4)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Double]("tpr")))).toMap
    // bucket 3 holds {25(+), 31(+)}: tp=2 fp=0 tpr=0.5
    assert(pts(3L) === ((2L, 0L, 0.5)))
    // bucket 2 adds {17(-)}: tp=2 fp=1
    assert(pts(2L) === ((2L, 1L, 0.5)))
    // bucket 0 covers everything: tp=4 fp=2 tpr=1.0
    assert(pts(0L) === ((4L, 2L, 1.0)))
  }

  test("count-min never undercounts and merges exactly across partitions") {
    val keys = (0 until 2000).map(i => Tuple1((i % 97).toLong))
    val df = keys.toDF("k")
    def sketch(parts: Int) =
      Frequency.countMin(df.repartition(parts), col("k"), w = 256, d = 3, salt = "t")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sketch(1) === sketch(13)) // counter sums are partition-invariant
    val exact = df.groupBy("k").count()
    val est = Frequency.cmEstimate(exact, col("k"),
      Frequency.countMin(df, col("k"), 256, 3, "t"), 256, 3, "t")
    est.select(col("count"), col("est_cnt")).as[(Long, Long)].collect()
      .foreach { case (ex, e) => assert(e >= ex, s"undercount: $e < $ex") }
  }

  test("kCorePeel cascades and converges on a known structure") {
    // K5 clique (nodes 0-4) + a braced tail: 5~{0,1,6}, 6~{5,0,7},
    // 7~{6}. Every tail node starts at deg >= 3 except 7, so the peel
    // CASCADES: 7 (deg 1) round 1, then 6 drops to 2 -> round 2, then
    // 5 drops to 2 -> round 3; the clique survives at degree 4 and
    // round 4 removes nothing -> converged
    val k5 = for (u <- 0L to 4L; v <- 0L to 4L if u < v) yield (u, v)
    val edges = (k5 ++ Seq((0L, 5L), (1L, 5L), (5L, 6L), (0L, 6L), (6L, 7L)))
      .toDF("u", "v")
    val r = Centrality.kCorePeel(edges, k = 3, rounds = 4)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(7L)._1 === 1L && r(6L)._1 === 2L && r(5L)._1 === 3L)
    (0L to 4L).foreach { n =>
      assert(r(n) === ((0L, if (n == 0L) 4L else 4L, true)))
    }
    // not converged when rounds stop mid-cascade
    val r2 = Centrality.kCorePeel(edges, k = 3, rounds = 2).collect()
      .map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(!r2(0L))
  }

  test("editDistanceJoin: all three edit kinds found, transpositions rejected") {
    val names = Seq((1L, "spark"), (2L, "spork"), // substitution
      (3L, "sparks"), // insertion
      (4L, "spak"), // deletion
      (5L, "sprak"), // transposition -> distance 2, must NOT match 1
      (6L, "query"), (7L, "spark"), // exact duplicate name -> dist 0
      (8L, ""), (9L, "a")) // empty name: dist("", "a") = 1 must be found
      .toDF("id", "n")
    val got = Blocking.editDistanceJoin(names, col("id"), col("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 1L)) &&
      got.contains((1L, 4L, 1L)) && got.contains((1L, 7L, 0L)))
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L)) // sprak is distance 2 from spark
    // exhaustive: equals in-memory brute force
    val all = names.collect().map(r => r.getLong(0) -> r.getString(1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, na) <- all; (ib, nb) <- all if ia < ib
      dd = lev(na, nb) if dd <= 1
    } yield (ia, ib, dd.toLong)).toSet
    assert(got === want)
  }

  test("pagerank mass is conserved up to floor loss on a random graph") {
    val scale = 1000000000000L
    val edges = (0 until 400).map(i => ((i % 37).toLong, ((i * 7) % 41).toLong))
      .distinct.toDF("src", "dst")
    val ranks = Centrality.pageRank(edges, rounds = 3, scale = scale)
      .select(sum("rank")).as[Long].head()
    assert(ranks <= scale)
    // floor losses: bounded by ~(edges + 2*nodes) units per round
    assert(ranks >= scale - 3L * (400 + 2 * 78))
  }

  test("seedProximity: exact BFS distances, hop bound respected, seeds win ties") {
    // path 1-2-3-4-5-6-7-8-9-10 plus a disconnected pair 20-21
    val edges = ((1L until 10L).map(i => (i, i + 1)) :+ ((20L, 21L)))
      .toDF("src", "dst")
    val seeds = Seq(3L, 21L).toDF("id")
    val out = Centrality.seedProximity(edges, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(
      3L -> 0L, 2L -> 1L, 4L -> 1L, 1L -> 2L, 5L -> 2L, 6L -> 3L,
      21L -> 0L, 20L -> 1L))
    // two seeds: min distance wins
    val out2 = Centrality.seedProximity(edges, Seq(1L, 5L).toDF("id"), 2)
      .as[(Long, Long)].collect().toMap
    assert(out2(3L) == 2L && out2(4L) == 1L && out2(6L) == 1L && out2(7L) == 2L)
    assert(!out2.contains(8L)) // beyond the hop bound
  }

  test("bfsDistances: per-seed labeled distances, frontier-only expansion") {
    // path 1-2-3-4-5 plus shortcut 1-4: seed 1 reaches 4 at dist 2
    // (via the shortcut, not 3 via the path), 5 at dist 3
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val e = und.toDF("src", "dst")
      .unionByName(und.map(_.swap).toDF("src", "dst"))
    val out = Centrality.bfsDistances(e, Seq(1L, 5L).toDF("seed"), maxHops = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, d) => (s, n) -> d }.toMap
    assert(out((1L, 2L)) === 1L && out((1L, 4L)) === 1L)
    assert(out((1L, 3L)) === 2L && out((1L, 5L)) === 2L)
    assert(out((5L, 4L)) === 1L && out((5L, 1L)) === 2L && out((5L, 3L)) === 2L)
    assert(out((5L, 2L)) === 3L)
    assert(!out.contains((1L, 1L))) // a seed's own dist-0 row is dropped
    // a cycle back to the seed never overwrites dist 0
    assert(out.keySet.forall { case (s, n) => s != n })
  }

  test("hll: registers merge exactly (shard max ≡ one pass); estimate " +
      "lands within the sketch's error band") {
    val n = 5000
    val df = (1 to n).map(i => (if (i % 2 == 0) "a" else "b", i.toLong))
      .toDF("g", "k")
    val p = 8
    // mergeability: per-shard sketches max-merged equal the one-pass
    // sketch — the property that makes HLL maintainable per day/shard
    val whole = Hll.registers(df, col("g"), col("k"), p)
    val h1 = Hll.registers(df.filter(col("k") % 3 === 0), col("g"), col("k"), p)
    val h2 = Hll.registers(df.filter(col("k") % 3 =!= 0), col("g"), col("k"), p)
    val merged = Hll.merge(h1, h2)
    val a = whole.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = merged.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a === b)
    // accuracy: std error ≈ 1.04/√256 ≈ 6.5%; assert a generous 20%
    val rep = Hll.groupDistinct(df, col("g"), col("k"), p)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    Seq("a", "b").foreach { g =>
      val est = rep(g)
      assert(math.abs(est - 2500.0) / 2500.0 < 0.2, s"group $g est=$est")
    }
    // harmonic_num stays within the BIGINT bound m·2^R by construction
    val num = Hll.groupDistinct(df, col("g"), col("k"), p)
      .collect().map(_.getAs[Long]("harmonic_num"))
    assert(num.forall(v => v > 0L && v <= (1L << 8) * (1L << 53)))
  }

  test("hll two-range estimator: linear counting at n << m (round 16), " +
      "raw harmonic beyond the 2.5m threshold") {
    // 2 distinct keys at p=8: the RAW harmonic estimate reads ~180
    // (254 empty registers still weigh the mean) — the linear-counting
    // branch must engage and land at ~2
    val tiny = Seq(("g", 1L), ("g", 2L), ("g", 1L)).toDF("g", "k")
    val r = Hll.groupDistinct(tiny, col("g"), col("k"), 8).collect()(0)
    val nrs = r.getAs[Long]("n_registers_set")
    val want = BigDecimal(256.0 * math.log(256.0 / (256.0 - nrs)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("est_distinct") === want)
    assert(math.abs(r.getAs[Double]("est_distinct") - 2.0) < 0.5)
    // n = 5000 ≫ 2.5·m stays on the raw arm (asserted exactly in the
    // merge and small-p tests above/below)
  }

  test("betweenness: hand-computed dependencies on a path and a diamond") {
    val S = 1000000L
    // path 1→2→3: δ(2) = 1 (all of seed 1's shortest paths to 3 cross
    // 2); terminal layer dep 0 by the bounded-round contract
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Centrality.betweenness(path, Seq(1L).toDF("id"), maxHops = 2,
        scale = S).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p((1L, 2L)) === ((1L, 1L, S)))  // dist 1, σ 1, δ = scale
    assert(p((1L, 3L)) === ((2L, 1L, 0L))) // terminal layer
    // diamond 1→{2,3}→4: σ(4) = 2, each middle node carries half the
    // dependency: δ(2) = δ(3) = σ(v)·(S + 0) div σ(4) = S/2
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val dmd = Centrality.betweenness(diamond, Seq(1L).toDF("id"),
        maxHops = 2, scale = S).collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(dmd(2L) === ((1L, 1L, S / 2)))
    assert(dmd(3L) === ((1L, 1L, S / 2)))
    assert(dmd(4L) === ((2L, 2L, 0L)))
    // maxHops past the diameter: the terminal layers are EMPTY — the
    // single-aggregate layer-count map (round-16 optimization) must
    // default missing layers to 0, and dependencies must equal the
    // exact-diameter run (empty deepest layer seeds nothing)
    val pLong = Centrality.betweenness(path, Seq(1L).toDF("id"),
        maxHops = 4, scale = S).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(pLong((1L, 2L)) === ((1L, 1L, S)))
    assert(pLong((1L, 3L)) === ((2L, 1L, 0L)))
  }

  test("hll small-p: exact Flajolet constants at m in {16,32,64}, " +
      "estimates stay in band") {
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "k")
    Seq(4 -> 0.673, 5 -> 0.697, 6 -> 0.709).foreach { case (p, alpha) =>
      val m = 1L << p
      val rMax = 60 - p + 1
      val r = Hll.groupDistinct(df, col("g"), col("k"), p).collect()(0)
      val num = r.getAs[Long]("harmonic_num")
      val est = r.getAs[Double]("est_distinct")
      // the estimate must be the exact small-m α form, not the
      // asymptotic one (round-14 finding #2)
      val want = BigDecimal(alpha * m * m * math.pow(2.0, rMax) / num)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(est === want, s"p=$p")
      // raw-estimator regime (n >> 5/2·m at every p here): generous
      // 3σ band around the true 5000 (σ ≈ 1.04/√m)
      val sigma = 1.04 / math.sqrt(m.toDouble)
      assert(math.abs(est - 5000.0) / 5000.0 < 3 * sigma, s"p=$p est=$est")
    }
  }

  test("adjustedRand: hand-computed ARI, perfect = 1, degenerate = null") {
    // same 6-item fixture as clusterAgreement: tp=2, pp=4, tt=4, N=15
    // ARI = (2 − 16/15) / (4 − 16/15) = 0.318182 at 6 dp
    val pred = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("id", "p")
    val truth = Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L),
      (5L, 200L), (6L, 300L)).toDF("id", "t")
    val r = Eval.adjustedRand(pred, truth).collect()(0)
    assert(r.getAs[Long]("total_pairs") === 15L)
    assert(r.getAs[Double]("ari") === 0.318182)
    // identical partitions: chance-corrected perfect agreement
    val same = Eval.adjustedRand(pred,
      pred.select(col("id"), col("p").as("t"))).collect()(0)
    assert(same.getAs[Double]("ari") === 1.0)
    // both all-singletons: zero pairs on every margin -> 0/0 -> NULL,
    // never NaN (the undefined-by-construction arm)
    val single = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "p")
    val deg = Eval.adjustedRand(single,
      single.select(col("id"), col("p").as("t"))).collect()(0)
    assert(deg.isNullAt(deg.fieldIndex("ari")))
  }

  test("clusterAgreement: hand-computed contingency on 6 items") {
    // pred {1,2,3},{4,5},{6}; truth {1,2},{3,4,5},{6}
    val pred = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 30L)).toDF("id", "p")
    val truth = Seq((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L),
      (5L, 200L), (6L, 300L)).toDF("id", "t")
    val r = Eval.clusterAgreement(pred, truth).collect()(0)
    assert(r.getAs[Long]("n_items") === 6L)
    assert(r.getAs[Long]("pred_clusters") === 3L)
    assert(r.getAs[Long]("true_clusters") === 3L)
    assert(r.getAs[Long]("pred_pairs") === 4L)  // C(3,2)+C(2,2) = 3+1
    assert(r.getAs[Long]("true_pairs") === 4L)  // C(2,2)+C(3,2) = 1+3
    assert(r.getAs[Long]("tp_pairs") === 2L)    // {1,2} and {4,5}
    // bcubed: (4/3 + 1/3 + 4/2 + 1)/6 = 0.777778 both ways (symmetric)
    assert(r.getAs[Double]("bcubed_prec") === 0.777778)
    assert(r.getAs[Double]("bcubed_rec") === 0.777778)
    // identical clusterings score perfect agreement
    val same = Eval.clusterAgreement(pred,
      pred.select(col("id"), col("p").as("t"))).collect()(0)
    assert(same.getAs[Long]("tp_pairs") === same.getAs[Long]("pred_pairs"))
    assert(same.getAs[Double]("bcubed_prec") === 1.0)
    assert(same.getAs[Double]("bcubed_rec") === 1.0)
  }

  test("modularityReport: two triangles + a bridge, hand-computed integers") {
    // communities {1,2,3} and {4,5,6}, bridge 3-4: m=7, e_c=3 each,
    // D_c = 2+2+3 = 7 each -> contrib = 4*7*3 - 49 = 35, den = 196,
    // Q = 70/196 ~ 0.357
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "label")
    val rows = Centrality.modularityReport(und, labels).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") === 3L)
      assert(r.getAs[Long]("intra_edges") === 3L)
      assert(r.getAs[Long]("degree_sum") === 7L)
      assert(r.getAs[Long]("contrib_num") === 35L)
      assert(r.getAs[Long]("contrib_den") === 196L)
    }
    // a labeling that splits a triangle scores WORSE than the natural one
    val badLabels = Seq((1L, 1L), (2L, 4L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "label")
    val qGood = rows.map(_.getAs[Long]("contrib_num")).sum
    val qBad = Centrality.modularityReport(und, badLabels).collect()
      .map(_.getAs[Long]("contrib_num")).sum
    assert(qBad < qGood)
  }

  test("modularityReport: a partial labeling fails loudly, never " +
      "silently misreports") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val partial = Seq((1L, 1L), (2L, 1L)).toDF("node", "label") // 3 unlabeled
    val e = intercept[Exception] {
      Centrality.modularityReport(und, partial).collect()
    }
    assert(e.getMessage.contains("no label") ||
      Option(e.getCause).exists(_.getMessage.contains("no label")))
  }

  test("clusterAgreement: a one-sided id fails loudly; empty inputs " +
      "yield null bcubed, not NaN") {
    val pred = Seq((1L, 10L), (2L, 10L)).toDF("id", "p")
    val truthShort = Seq((1L, 100L)).toDF("id", "t") // id 2 missing
    val e = intercept[Exception] {
      Eval.clusterAgreement(pred, truthShort).collect()
    }
    assert(e.getMessage.contains("only in") ||
      Option(e.getCause).exists(_.getMessage.contains("only in")))
    val empty = Seq.empty[(Long, Long)].toDF("id", "p")
    val r = Eval.clusterAgreement(empty,
      empty.select(col("id"), col("p").as("t"))).collect()(0)
    assert(r.getAs[Long]("n_items") === 0L)
    assert(r.isNullAt(r.fieldIndex("bcubed_prec")))
    assert(r.isNullAt(r.fieldIndex("bcubed_rec")))
  }
}
