package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edge dedupe (R4/J11/T7) — merge duplicate relationship entities
  * (zavod/zavod/integration/edges.py:78-422):
  *
  *  1. bucket edges by (schema, canonical endpoints) — undirected
  *     schemata normalize endpoint order (edges.py:78-127);
  *  2. within a bucket, connect edges whose partial-ISO date intervals
  *     overlap (empty = wildcard — edges.py:129-195, T7) and take
  *     transitive closure → temporal candidate groups;
  *  3. veto a group when any two members carry non-empty, disjoint
  *     slugified protected-property value sets (empty set = wildcard —
  *     edges.py:283-322);
  *  4. surviving multi-member groups become merge decisions keyed by
  *     the group's minimum edge id (edges.py:324-422).
  *
  * Scale: the pair join is bucket-local AND representative-collapsed —
  * members with identical (interval bounds, protected set) are
  * interchangeable for both the overlap and veto predicates, so they
  * collapse to one representative (min edge_id) before any pairing. A
  * poisoned dataset emitting 100k copies of one relationship therefore
  * contributes ONE rep, not 5×10⁹ pairs. Buckets that still exceed
  * `maxRepsPerBucket` DISTINCT reps get a rank-neighborhood cap on the
  * pair join (sorted by interval start, each rep pairs with its nearest
  * [[CapNeighborhood]] reps) — a bounded approximation that is logged,
  * never silent. The transitive closure runs on the rep pair graph,
  * orders of magnitude smaller than the edge frame.
  */
object EdgeDedup {

  /** Pairing neighborhood (in interval-start rank order) applied inside
    * buckets larger than `maxRepsPerBucket` reps. */
  val CapNeighborhood = 64

  /** edges: (edge_id long, schema, source, target, startDate, endDate,
    * protected array<string>) with `directed` telling which schemata
    * keep endpoint order. Returns (edge_id, cluster, vetoed): cluster =
    * min edge_id of the merge group (self when unmerged/vetoed). */
  def mergeGroups(
      edges: DataFrame,
      directedSchemas: Set[String],
      maxRepsPerBucket: Int = 4096): DataFrame = {
    val directed = lit(directedSchemas.toSeq.sorted.toArray)
    val keyed = edges.withColumn("bucket",
      concat_ws("|", col("schema"),
        when(array_contains(directed, col("schema")),
          concat_ws(">", col("source"), col("target")))
          .otherwise(Consolidate.undirectedKey(col("source"), col("target")))))
      .withColumn("slugs", array_sort(array_distinct(transform(col("protected"),
        v => graft.functions.Ids.slugify(v)))))
      .withColumn("lo", Consolidate.partialDateLower(col("startDate")))
      .withColumn("hi", Consolidate.partialDateUpper(col("endDate")))
      // identical (bounds, slugs) members are interchangeable — EXCEPT
      // degenerate inverted intervals (lo > hi), which do not overlap
      // even themselves under the interval formula, so collapsing them
      // would fuse edges the exact semantics keeps apart; they stay
      // singleton reps (slug values are [a-z0-9-], separators safe)
      .withColumn("rep_key",
        when(col("lo") <= col("hi"),
          concat_ws("", col("lo"), col("hi"),
            concat_ws("", col("slugs"))))
          .otherwise(concat(lit("!"), col("edge_id"))))

    val reps = keyed
      .groupBy(col("bucket"), col("rep_key"))
      .agg(min(col("edge_id")).as("rep_id"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        first(col("slugs")).as("slugs"))
      .persist()

    // one cheap aggregate pass over the persisted rep frame both
    // surfaces capped buckets (never silent) and short-circuits the
    // rank/neighborhood machinery: in the common case (every bucket
    // small) the pair join below needs NO window pass at all
    val capped = reps.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxRepsPerBucket).select(col("bucket")).limit(5)
      .collect().map(_.getString(0))

    // bucket-local overlap pairs over REPS (T7; empty dates = wildcard)
    val base = reps.select(col("bucket"), col("rep_id"), col("lo"), col("hi"))
    val overlapPairs = if (capped.isEmpty) {
      val l = base.select(col("bucket"), col("rep_id").as("a"),
        col("lo").as("la"), col("hi").as("ha"))
      val r = base.select(col("bucket"), col("rep_id").as("b"),
        col("lo").as("lb"), col("hi").as("hb"))
      l.join(r, "bucket")
        .filter(col("a") < col("b"))
        .filter(col("la") <= col("hb") && col("lb") <= col("ha"))
        .select(col("a").as("src"), col("b").as("dst"))
    } else {
      System.err.println(
        s"[graft] EdgeDedup: pair cap (neighborhood=$CapNeighborhood) applied to " +
          s"bucket(s) over $maxRepsPerBucket reps: ${capped.mkString(", ")} ...")
      // rank once; bucket size = max(rnk) over the already-partitioned
      // frame (reuses the row_number exchange+sort — no second shuffle,
      // no separate aggregate pass, no driver round-trip beyond the one
      // cap probe above)
      val ranked = base
        .withColumn("rnk", row_number().over(
          Window.partitionBy("bucket").orderBy(col("lo"), col("hi"), col("rep_id"))))
        .withColumn("bn", max(col("rnk")).over(Window.partitionBy("bucket")))
      val l = ranked.select(col("bucket"), col("rep_id").as("a"),
        col("lo").as("la"), col("hi").as("ha"), col("rnk").as("ra"), col("bn"))
      val r = ranked.select(col("bucket"), col("rep_id").as("b"),
        col("lo").as("lb"), col("hi").as("hb"), col("rnk").as("rb"))
      l.join(r, "bucket")
        .filter(col("a") < col("b"))
        .filter(col("bn") <= maxRepsPerBucket ||
          abs(col("rb") - col("ra")) <= CapNeighborhood)
        .filter(col("la") <= col("hb") && col("lb") <= col("ha"))
        .select(col("a").as("src"), col("b").as("dst"))
    }

    // temporal candidate groups = transitive closure of overlap
    val nodes = reps.select(col("rep_id").as("id"))
    val groups = ConnectedComponents.run(nodes, overlapPairs)
      .withColumnRenamed("component", "group")
    val repGroups = reps.join(groups, col("rep_id") === col("id")).drop("id")

    // members inherit their rep's group
    val withGroup = keyed.join(
      repGroups.select(col("bucket"), col("rep_key"), col("group")),
      Seq("bucket", "rep_key"))

    // group veto over DISTINCT non-empty protected sets (identical sets
    // never veto each other: their intersection is the full set)
    val sets = repGroups.filter(size(col("slugs")) > 0)
      .select(col("group"), col("slugs")).distinct()
    val vetoedGroups = sets.select(col("group"), col("slugs").as("pa"))
      .join(sets.select(col("group"), col("slugs").as("pb")), "group")
      .filter(col("pa") =!= col("pb"))
      .filter(size(array_intersect(col("pa"), col("pb"))) === 0)
      .select(col("group")).distinct()
      .withColumn("vetoed", lit(true))

    val sized = withGroup.groupBy(col("group"))
      .agg(min(col("edge_id")).as("canonical"), count(lit(1)).as("members"))
    val result = withGroup
      .join(sized, "group")
      .join(vetoedGroups, Seq("group"), "left")
      .withColumn("vetoed", coalesce(col("vetoed"), lit(false)))
      .select(col("edge_id"),
        when(!col("vetoed") && col("members") > 1, col("canonical"))
          .otherwise(col("edge_id")).as("cluster"),
        col("vetoed"))
    // materialize the (edge_id, cluster, vetoed) result eagerly, then
    // release the rep cache: without this every mergeGroups call left
    // `reps` persisted for the life of the session (the cap probe above
    // already makes this operator action-ful, so the barrier adds no
    // new eagerness class). The checkpointed result is GC-cleaned.
    val out = result.localCheckpoint(true)
    reps.unpersist(blocking = false)
    out
  }
}
