package graft.model

/** Compact FollowTheMoney-style schema registry: an inheritance lattice of
  * entity schemata, property typing, and edge (interstitial) schemata.
  *
  * Mirrors the semantics the reference relies on (schema narrowing via
  * `model.common_schema` — zavod/zavod/entity.py:89-135,155-162; edge
  * schemata with source/target props — zavod/zavod/integration/edges.py:78-110)
  * without depending on the FtM YAML files: the lattice here is a small,
  * self-contained Scala value. It is plain metadata — broadcast to executors
  * by capture in closures/Aggregators, never part of a Spark schema.
  */
object FtmModel {

  /** Property value types (followthemoney registry analog). */
  sealed trait PropType
  object PropType {
    case object Name       extends PropType
    case object Date       extends PropType // partial ISO prefix strings: 1990, 1990-05, 1990-05-01
    case object Country    extends PropType
    case object Identifier extends PropType
    case object EntityRef  extends PropType // foreign key to another entity
    case object Topic      extends PropType // controlled vocabulary
    case object Address    extends PropType
    case object Phone      extends PropType
    case object Email      extends PropType
    case object Url        extends PropType
    case object Language   extends PropType
    case object Text       extends PropType
    case object Number     extends PropType
  }

  final case class PropDef(name: String, ptype: PropType, maxLength: Int = 1024)

  final case class SchemaDef(
      name: String,
      parents: Seq[String],
      props: Seq[PropDef] = Nil,
      // edge schemata (Ownership, Directorship, ...): the props holding the
      // two endpoints, plus whether the edge is directed
      edgeSource: Option[String] = None,
      edgeTarget: Option[String] = None,
      edgeDirected: Boolean = true,
      // FtM `matchable`: participates in cross-reference / record linkage
      // (followthemoney schema flag; drives the senzing export scope)
      matchable: Boolean = false
  ) {
    def isEdge: Boolean = edgeSource.isDefined && edgeTarget.isDefined
  }

  import PropType._

  private def p(n: String, t: PropType) = PropDef(n, t)

  /** The schema lattice. A deliberately small but structurally faithful
    * subset of FtM: Thing at the root, LegalEntity under it, concrete
    * entity types, plus interval/edge schemata. */
  val schemata: Map[String, SchemaDef] = Seq(
    SchemaDef("Thing", Nil, Seq(
      p("name", Name), p("alias", Name), p("weakAlias", Name),
      p("country", Country), p("topics", Topic), p("notes", Text),
      p("createdAt", Date), p("modifiedAt", Date), p("sourceUrl", Url))),
    SchemaDef("LegalEntity", Seq("Thing"), Seq(
      p("legalForm", Text), p("registrationNumber", Identifier),
      p("taxNumber", Identifier), p("innCode", Identifier),
      p("ogrnCode", Identifier), p("leiCode", Identifier),
      p("address", Address), p("addressEntity", EntityRef),
      p("phone", Phone), p("email", Email),
      p("website", Url), p("incorporationDate", Date),
      p("dissolutionDate", Date), p("programId", Identifier),
      p("permId", Identifier), p("ricCode", Identifier)),
      matchable = true),
    SchemaDef("Person", Seq("LegalEntity"), Seq(
      p("firstName", Name), p("secondName", Name), p("middleName", Name),
      p("lastName", Name), p("fatherName", Name), p("motherName", Name),
      p("title", Name), p("birthDate", Date),
      p("deathDate", Date), p("birthPlace", Text), p("nationality", Country),
      p("gender", Text), p("position", Text)),
      matchable = true),
    // imoNumber on Organization mirrors FtM's IMO company identifiers
    // (exercised by the maritime export — exporters/maritime.py:66-69)
    SchemaDef("Organization", Seq("LegalEntity"), Seq(p("imoNumber", Identifier)), matchable = true),
    SchemaDef("Company", Seq("Organization"), Seq(
      p("isinCode", Identifier), p("jurisdiction", Country)), matchable = true),
    SchemaDef("PublicBody", Seq("Organization"), Nil, matchable = true),
    SchemaDef("Asset", Seq("Thing"), Nil),
    SchemaDef("Security", Seq("Asset"), Seq(
      p("isin", Identifier), p("issuer", EntityRef)), matchable = true),
    SchemaDef("Vessel", Seq("Asset"), Seq(
      p("imoNumber", Identifier), p("flag", Country), p("mmsi", Identifier)),
      matchable = true),
    SchemaDef("Airplane", Seq("Asset"), Seq(p("registrationNumber", Identifier)), matchable = true),
    SchemaDef("Address", Seq("Thing"), Seq(
      p("full", Address), p("street", Text), p("city", Text),
      p("postalCode", Text), p("region", Text)), matchable = true),
    SchemaDef("Position", Seq("Thing"), Seq(
      p("subnationalArea", Text), p("inceptionDate", Date),
      p("dissolutionDate", Date), p("numberOfSeats", Number)),
      matchable = true),
    SchemaDef("Article", Seq("Thing"), Seq(
      p("title", Text), p("publishedAt", Date))),
    SchemaDef("Documentation", Seq("Thing"), Seq(
      p("entity", EntityRef), p("document", EntityRef), p("date", Date)),
      edgeSource = Some("entity"), edgeTarget = Some("document")),
    SchemaDef("Sanction", Seq("Thing"), Seq(
      p("entity", EntityRef), p("authority", Text), p("program", Text),
      p("programId", Identifier), p("startDate", Date), p("endDate", Date),
      p("listingDate", Date), p("reason", Text))),
    SchemaDef("Identification", Seq("Thing"), Seq(
      p("holder", EntityRef), p("number", Identifier), p("type", Text),
      p("country", Country), p("authority", Text),
      p("startDate", Date), p("endDate", Date))),
    SchemaDef("Passport", Seq("Identification"), Seq(
      p("passportNumber", Identifier))),
    // Edge schemata (zavod/zavod/integration/edges.py:78-110)
    SchemaDef("Ownership", Seq("Thing"), Seq(
      p("owner", EntityRef), p("asset", EntityRef),
      p("percentage", Number), p("startDate", Date), p("endDate", Date)),
      edgeSource = Some("owner"), edgeTarget = Some("asset")),
    SchemaDef("Directorship", Seq("Thing"), Seq(
      p("director", EntityRef), p("organization", EntityRef),
      p("role", Text), p("startDate", Date), p("endDate", Date)),
      edgeSource = Some("director"), edgeTarget = Some("organization")),
    SchemaDef("Membership", Seq("Thing"), Seq(
      p("member", EntityRef), p("organization", EntityRef),
      p("role", Text), p("startDate", Date), p("endDate", Date)),
      edgeSource = Some("member"), edgeTarget = Some("organization")),
    SchemaDef("Family", Seq("Thing"), Seq(
      p("person", EntityRef), p("relative", EntityRef),
      p("relationship", Text), p("startDate", Date), p("endDate", Date)),
      edgeSource = Some("person"), edgeTarget = Some("relative"),
      edgeDirected = false),
    SchemaDef("Associate", Seq("Thing"), Seq(
      p("person", EntityRef), p("associate", EntityRef),
      p("relationship", Text)),
      edgeSource = Some("person"), edgeTarget = Some("associate"),
      edgeDirected = false),
    SchemaDef("Occupancy", Seq("Thing"), Seq(
      p("holder", EntityRef), p("post", EntityRef),
      p("startDate", Date), p("endDate", Date), p("status", Text)),
      edgeSource = Some("holder"), edgeTarget = Some("post")),
    SchemaDef("UnknownLink", Seq("Thing"), Seq(
      p("subject", EntityRef), p("object", EntityRef), p("role", Text)),
      edgeSource = Some("subject"), edgeTarget = Some("object"))
  ).map(s => s.name -> s).toMap

  /** Risk topics that make an entity a "target"
    * (zavod/zavod/entity.py:164-167). */
  val riskTopics: Set[String] = Set(
    "sanction", "sanction.linked", "sanction.counter",
    "crime", "crime.fraud", "crime.terror", "crime.theft", "crime.war",
    "crime.boss", "crime.fin", "crime.traffick",
    "debarment", "poi", "wanted", "export.control", "export.risk")

  /** Ancestors of a schema, including itself (is_a closure). */
  val ancestors: Map[String, Set[String]] = {
    def walk(n: String): Set[String] =
      schemata.get(n).map(s => s.parents.toSet.flatMap(walk) + n).getOrElse(Set(n))
    schemata.keys.map(n => n -> walk(n)).toMap
  }

  /** Descendants of a schema, including itself — used to expand a schema
    * filter to the whole subtree (P3: local_enricher.py:238-241). */
  val descendants: Map[String, Set[String]] =
    schemata.keys.map { n =>
      n -> schemata.keys.filter(c => ancestors(c).contains(n)).toSet
    }.toMap

  /** Schemata participating in record linkage (xref / senzing export). */
  val matchableSchemata: Set[String] =
    schemata.values.filter(_.matchable).map(_.name).toSet

  def isA(child: String, parent: String): Boolean =
    ancestors.getOrElse(child, Set(child)).contains(parent)

  /** Schema narrowing: the most specific schema compatible with both, i.e.
    * the least common *descendant* (entity.py:155-162). Returns None when
    * the two schemata are incompatible (no common descendant). */
  def commonSchema(a: String, b: String): Option[String] = {
    if (a == b) Some(a)
    else if (isA(a, b)) Some(a)
    else if (isA(b, a)) Some(b)
    else {
      val common = descendants.getOrElse(a, Set.empty)
        .intersect(descendants.getOrElse(b, Set.empty))
      if (common.isEmpty) None
      // most general of the common descendants (fewest ancestors)
      else Some(common.minBy(c => (ancestors(c).size, c)))
    }
  }

  /** All properties of a schema including inherited ones. */
  def allProps(schema: String): Map[String, PropDef] =
    ancestors.getOrElse(schema, Set(schema)).toSeq.sorted
      .flatMap(s => schemata.get(s).map(_.props).getOrElse(Nil))
      .map(pd => pd.name -> pd).toMap

  /** Props of a schema whose type is EntityRef — the adjacency edges. */
  def entityRefProps(schema: String): Set[String] =
    allProps(schema).collect { case (n, pd) if pd.ptype == PropType.EntityRef => n }.toSet
}
