package graft.model

/** An entity: the aggregate of all statements sharing a canonical ID.
  *
  * Mirrors the reference's assemble step (zavod/zavod/store.py:36-47):
  * properties are multi-valued string sets, the schema is the narrowed
  * (most specific) schema across statements, `referents` collects the
  * source-scoped IDs merged into the cluster, and first/last seen span
  * the statement provenance window.
  */
final case class Entity(
    id: String,
    schema: String,
    properties: Map[String, Seq[String]],
    datasets: Seq[String],
    referents: Seq[String],
    firstSeen: Option[java.sql.Timestamp],
    lastSeen: Option[java.sql.Timestamp]
) {
  def values(prop: String): Seq[String] =
    properties.getOrElse(prop, Nil)

  def first(prop: String): Option[String] = values(prop).headOption

  /** Entity-ref values across all EntityRef-typed props (adjacency out-edges). */
  def entityRefs: Seq[(String, String)] = {
    val refProps = FtmModel.entityRefProps(schema)
    properties.toSeq.collect {
      case (p, vs) if refProps.contains(p) => vs.map(v => (p, v))
    }.flatten
  }

  def topics: Seq[String] = values("topics")

  /** An entity is a "target" iff it carries at least one risk topic
    * (zavod/zavod/entity.py:164-167). */
  def isTarget: Boolean = topics.exists(FtmModel.riskTopics.contains)
}
