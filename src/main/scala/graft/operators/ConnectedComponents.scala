package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components (R1): the resolver's union-find over
  * judgement edges (zavod/zavod/integration/dedupe.py:22-39,93-128) as an
  * iterative DataFrame algorithm.
  *
  * Implements alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14), which
  * converges in O(log^2 n) rounds even on path graphs — min-label
  * propagation would need O(diameter) rounds, which is unusable at scale.
  *
  * Scale notes: every round is two shuffles on the edge frame keyed by
  * node id; lineage is cut with localCheckpoint each round so the plan
  * doesn't grow unboundedly; convergence is detected via an aggregate
  * (sum of edge endpoints) instead of collecting edges.
  */
object ConnectedComponents {

  /** edges: two long columns (src, dst). Returns (id, component) where
    * component = min node id of the connected component. Nodes given in
    * `nodes` (single long column `id`) are included even when isolated. */
  def run(nodes: DataFrame, edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    val n = nodes.toDF("id")
    // Symmetrize and self-loop-strip; (u,v) with u<v canonical direction.
    var e = edges.toDF("src", "dst")
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var converged = false
    var iter = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    while (!converged && iter < maxIterations) {
      // Large-star: for each node u, connect every strictly-larger neighbor
      // to m = min(N(u) ∪ {u}).
      val nbrs = e.select($"src".as("u"), $"dst".as("v"))
        .union(e.select($"dst".as("u"), $"src".as("v")))
      val minN = nbrs.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      val large = nbrs.join(minN, "u")
        .filter($"v" > $"u")
        .select($"v".as("src"), $"m".as("dst"))
        .filter($"src" =!= $"dst")
        .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
        .distinct()

      // Small-star: for each node u, connect every neighbor <= u (and u)
      // to m = min of those.
      val nbrsS = large.select($"dst".as("u"), $"src".as("v"))
        .union(large.select($"src".as("u"), $"dst".as("v")))
        .filter($"v" <= $"u")
      val minS = nbrsS.groupBy($"u").agg(min($"v").as("m"))
      val small = nbrsS.join(minS, "u")
        .select($"v".as("src"), $"m".as("dst"))
        .union(minS.select($"u".as("src"), $"m".as("dst")))
        .filter($"src" =!= $"dst")
        .select(least($"src", $"dst").as("src"), greatest($"src", $"dst").as("dst"))
        .distinct()
        .localCheckpoint(eager = true)

      val sig = small.agg(
        coalesce(sum($"src"), lit(0L)).as("s"),
        coalesce(count(lit(1)), lit(0L)).as("c"))
        .as[(Long, Long)].first()
      val old = e
      e = small.persist(StorageLevel.MEMORY_AND_DISK)
      old.unpersist(blocking = false)
      converged = sig == prevSig
      prevSig = sig
      iter += 1
    }

    // At fixpoint every edge is (node -> component root). Attach isolated nodes.
    val comp = e.select($"dst".as("id"), $"src".as("component"))
      .union(e.select($"src".as("id"), $"src".as("component")))
      .groupBy($"id").agg(min($"component").as("component"))
    val out = n.join(comp, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
    e.unpersist(blocking = false)
    out
  }

  /** Union-find with NEGATIVE constraints (the resolver's judgement
    * semantics): positive edges merge, but a merge bucket containing a
    * negative pair is flagged. Returns (id, component, vetoed). */
  def runWithNegatives(
      nodes: DataFrame,
      positive: DataFrame,
      negative: DataFrame): DataFrame = {
    val cc = run(nodes, positive)
    val neg = negative.toDF("a", "b")
    val compOf = cc.select(col("id"), col("component"))
    // a negative pair landing in one component vetoes that component
    val vetoed = neg
      .join(compOf.withColumnRenamed("id", "a").withColumnRenamed("component", "ca"), Seq("a"))
      .join(compOf.withColumnRenamed("id", "b").withColumnRenamed("component", "cb"), Seq("b"))
      .filter(col("ca") === col("cb"))
      .select(col("ca").as("component")).distinct()
      .withColumn("vetoed", lit(true))
    cc.join(vetoed, Seq("component"), "left")
      .select(col("id"), col("component"), coalesce(col("vetoed"), lit(false)).as("vetoed"))
  }
}
