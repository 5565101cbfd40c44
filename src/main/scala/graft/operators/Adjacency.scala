package graft.operators

import graft.model.FtmModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adjacency as DataFrames (J1/J2): the engine's property graph.
  *
  * The reference walks adjacency per entity through a bounded-buffer
  * point-lookup view (zavod/zavod/exporters/fragment.py:33-65,
  * entity.py:174-198); at scale that becomes one reusable EDGE FRAME —
  * entity-typed property values exploded into (src, prop, dst) rows —
  * that every consumer (nested export, simple.csv rollups, securities,
  * graph expansion, self-reference validation) joins against. The
  * (schema, prop) → is-entity-ref table is model metadata, broadcast.
  */
object Adjacency {

  /** The (schema, prop) pairs whose values are entity references,
    * derived from the FtM-style model registry. */
  def refPropsFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    FtmModel.schemata.keys.toSeq.sorted
      .flatMap(s => FtmModel.entityRefProps(s).toSeq.sorted.map(p => (s, p)))
      .toDF("schema", "prop")
  }

  /** J1 raw edges: (src_id, src_schema, prop, dst_id) — one row per
    * entity-ref value. `entities` must carry (id, schema,
    * properties: map<string, array<string>>). */
  def refEdges(entities: DataFrame): DataFrame = {
    val refProps = refPropsFrame(entities.sparkSession)
      .toDF("_ref_schema", "_ref_prop")
    entities
      .select(col("id").as("src_id"), col("schema").as("src_schema"),
        explode(col("properties")).as(Seq("prop", "vals")))
      .join(broadcast(refProps),
        col("src_schema") === col("_ref_schema") && col("prop") === col("_ref_prop"))
      .select(col("src_id"), col("src_schema"), col("prop"),
        explode(col("vals")).as("dst_id"))
  }

  private def forwardFrom(edges: DataFrame, entities: DataFrame): DataFrame =
    edges
      .join(entities.select(col("id").as("dst_id"), col("schema").as("dst_schema"),
        col("properties").as("dst_properties")), "dst_id")
      .select(col("src_id"), col("prop"), col("dst_id"), col("dst_schema"),
        col("dst_properties"))

  private def invertedFrom(edges: DataFrame, entities: DataFrame): DataFrame =
    edges
      .join(entities.select(col("id"), col("schema").as("_s"),
          col("properties").as("_p")),
        col("id") === col("src_id"))
      .select(col("dst_id").as("id"), col("prop"), col("src_id").as("ref_id"),
        col("_s").as("ref_schema"), col("_p").as("ref_properties"))

  /** J1 forward adjacency: source entity → referenced entity (inner join
    * drops dangling refs; the validator surfaces those separately).
    * Output: (src_id, prop, dst_id, dst_schema, dst_properties). */
  def forward(entities: DataFrame): DataFrame =
    forwardFrom(refEdges(entities), entities)

  /** J2 inverted adjacency: for each entity, the entities pointing AT it
    * (fragment.py:43-65). Output: (id, prop, ref_id, ref_schema,
    * ref_properties) — `ref_id` holds the pointing entity. */
  def inverted(entities: DataFrame): DataFrame =
    invertedFrom(refEdges(entities), entities)

  /** Both directions — the reference's `view.get_adjacent`
    * (fragment.py:33-65): forward refs plus inverted refs. The edge
    * frame is built once and shared by both branches (identical subplan
    * ⇒ exchange reuse). Output: (id, direction, prop, other_id,
    * other_schema, other_properties). */
  def adjacent(entities: DataFrame): DataFrame = {
    val edges = refEdges(entities)
    val fwd = forwardFrom(edges, entities).select(
      col("src_id").as("id"), lit("fwd").as("direction"), col("prop"),
      col("dst_id").as("other_id"), col("dst_schema").as("other_schema"),
      col("dst_properties").as("other_properties"))
    val inv = invertedFrom(edges, entities).select(
      col("id"), lit("inv").as("direction"), col("prop"),
      col("ref_id").as("other_id"), col("ref_schema").as("other_schema"),
      col("ref_properties").as("other_properties"))
    fwd.unionByName(inv)
  }

  /** J12: bounded graph expansion — entity ids reachable from `seeds`
    * (single column `id`) within `hops` hops over the undirected ref
    * edges (zavod/zavod/runner/local_enricher.py:123-147). Small fixed
    * hop count ⇒ unrolled joins, no iteration state. */
  def expand(entities: DataFrame, seeds: DataFrame, hops: Int = 2): DataFrame = {
    val e = refEdges(entities)
      .select(col("src_id").as("a"), col("dst_id").as("b"))
    val undirected = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    var frontier = seeds.toDF("id").distinct()
    var visited = frontier
    for (_ <- 1 to hops) {
      frontier = frontier.join(undirected, col("id") === col("a"))
        .select(col("b").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      visited = visited.unionByName(frontier).distinct()
    }
    visited
  }
}
