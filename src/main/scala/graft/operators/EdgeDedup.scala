package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale: the pair join is bucket-local (buckets are (schema, src, dst)
  * — naturally tiny), and the transitive closure runs on the pair
  * graph, which is orders of magnitude smaller than the edge frame.
  */
object EdgeDedup {

  /** edges: (edge_id long, schema, source, target, startDate, endDate,
    * protected array<string>) with `directed` telling which schemata
    * keep endpoint order. Returns (edge_id, cluster, vetoed): cluster =
    * min edge_id of the merge group (self when unmerged/vetoed). */
  def mergeGroups(edges: DataFrame, directedSchemas: Set[String]): DataFrame = {
    val directed = lit(directedSchemas.toSeq.sorted.toArray)
    val keyed = edges.withColumn("bucket",
      concat_ws("|", col("schema"),
        when(array_contains(directed, col("schema")),
          concat_ws(">", col("source"), col("target")))
          .otherwise(Consolidate.undirectedKey(col("source"), col("target")))))
      .withColumn("slugs", array_distinct(transform(col("protected"),
        v => graft.functions.Ids.slugify(v))))

    // bucket-local overlap pairs (T7; empty dates = wildcard)
    val l = keyed.select(col("bucket"), col("edge_id").as("a"),
      col("startDate").as("sa"), col("endDate").as("ea"))
    val r = keyed.select(col("bucket"), col("edge_id").as("b"),
      col("startDate").as("sb"), col("endDate").as("eb"))
    val overlapPairs = l.join(r, "bucket")
      .filter(col("a") < col("b"))
      .filter(Consolidate.intervalsOverlap(col("sa"), col("ea"), col("sb"), col("eb")))
      .select(col("a").as("src"), col("b").as("dst"))

    // temporal candidate groups = transitive closure of overlap
    val nodes = keyed.select(col("edge_id").as("id"))
    val groups = ConnectedComponents.run(nodes, overlapPairs)
      .withColumnRenamed("component", "group")

    val withGroup = keyed.join(groups, col("edge_id") === col("id")).drop("id")

    // group veto: any two members with non-empty disjoint protected sets
    val gl = withGroup.select(col("group"), col("edge_id").as("ga"), col("slugs").as("pa"))
    val gr = withGroup.select(col("group"), col("edge_id").as("gb"), col("slugs").as("pb"))
    val vetoedGroups = gl.join(gr, "group")
      .filter(col("ga") < col("gb"))
      .filter(size(col("pa")) > 0 && size(col("pb")) > 0 &&
        size(array_intersect(col("pa"), col("pb"))) === 0)
      .select(col("group")).distinct()
      .withColumn("vetoed", lit(true))

    val sized = withGroup.groupBy(col("group"))
      .agg(min(col("edge_id")).as("canonical"), count(lit(1)).as("members"))
    withGroup
      .join(sized, "group")
      .join(vetoedGroups, Seq("group"), "left")
      .withColumn("vetoed", coalesce(col("vetoed"), lit(false)))
      .select(col("edge_id"),
        when(!col("vetoed") && col("members") > 1, col("canonical"))
          .otherwise(col("edge_id")).as("cluster"),
        col("vetoed"))
  }
}
