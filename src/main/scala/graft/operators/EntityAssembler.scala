package graft.operators

import graft.model.{Entity, FtmModel, Statement}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Statement → Entity assembly (A1): group statements by canonical ID and
  * merge them into an [[Entity]] with schema narrowing and multi-valued
  * property sets.
  *
  * The reference does this as a sorted LevelDB scan
  * (zavod/zavod/store.py:36-74); here it is a typed Spark
  * `Aggregator[Statement, Buf, Entity]` driven by `groupByKey(canonicalId)`
  * — a distributed sort/hash aggregation with map-side partial merge, so
  * the statement stream for one entity never has to fit in one driver.
  *
  * Determinism: property values are sorted sets, so the result is
  * independent of statement arrival order across partitions.
  */
object EntityAssembler {

  final case class Buf(
      var schema: String,
      var props: Map[String, Set[String]],
      var datasets: Set[String],
      var referents: Set[String],
      var firstSeen: Long, // Long.MaxValue = unset
      var lastSeen: Long   // Long.MinValue = unset
  )

  /** Narrow two schemata to their most specific common schema; fall back to
    * lexicographically-first on conflict (the reference raises — we keep
    * the row and let validators flag it). */
  private def narrow(a: String, b: String): String =
    if (a == null || a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else FtmModel.commonSchema(a, b).getOrElse(if (a < b) a else b)

  val aggregator: Aggregator[Statement, Buf, Entity] =
    new Aggregator[Statement, Buf, Entity] {
      def zero: Buf = Buf("", Map.empty, Set.empty, Set.empty, Long.MaxValue, Long.MinValue)

      def reduce(b: Buf, s: Statement): Buf = {
        b.schema = narrow(b.schema, s.schema)
        if (s.prop != null && s.prop != Statement.Base && s.value != null) {
          b.props = b.props.updated(s.prop, b.props.getOrElse(s.prop, Set.empty) + s.value)
        }
        if (s.dataset != null) b.datasets += s.dataset
        if (s.entityId != null) b.referents += s.entityId
        if (s.firstSeen != null) b.firstSeen = math.min(b.firstSeen, s.firstSeen.getTime)
        if (s.lastSeen != null) b.lastSeen = math.max(b.lastSeen, s.lastSeen.getTime)
        b
      }

      def merge(x: Buf, y: Buf): Buf = {
        x.schema = narrow(x.schema, y.schema)
        x.props = y.props.foldLeft(x.props) { case (acc, (k, vs)) =>
          acc.updated(k, acc.getOrElse(k, Set.empty) ++ vs)
        }
        x.datasets ++= y.datasets
        x.referents ++= y.referents
        x.firstSeen = math.min(x.firstSeen, y.firstSeen)
        x.lastSeen = math.max(x.lastSeen, y.lastSeen)
        x
      }

      def finish(b: Buf): Entity = Entity(
        id = null, // filled by caller from the grouping key
        schema = b.schema,
        properties = b.props.map { case (k, vs) => k -> vs.toSeq.sorted },
        datasets = b.datasets.toSeq.sorted,
        referents = b.referents.toSeq.sorted,
        firstSeen = if (b.firstSeen == Long.MaxValue) None else Some(new java.sql.Timestamp(b.firstSeen)),
        lastSeen = if (b.lastSeen == Long.MinValue) None else Some(new java.sql.Timestamp(b.lastSeen))
      )

      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[Entity] = Encoders.product[Entity]
    }

  /** Assemble entities from a statement dataset, grouping by canonicalId
    * (falling back to entityId when unresolved). Delegates to the
    * columnar plan — a closure-keyed `groupByKey` would defeat column
    * pruning and serialize whole Statement objects through the shuffle —
    * and only the final `as[Entity]` is typed. The [[aggregator]] stays
    * as the typed-merge reference implementation (schema narrowing in
    * `merge`), cross-checked against this path in the spec. */
  def assemble(statements: Dataset[Statement]): Dataset[Entity] = {
    import statements.sparkSession.implicits._
    assembleColumnar(statements.toDF()).as[Entity]
  }

  /** The typed-Aggregator assemble (kept for API parity and as the
    * semantics reference for the columnar plan). */
  def assembleAggregator(statements: Dataset[Statement]): Dataset[Entity] = {
    import statements.sparkSession.implicits._
    statements
      .groupByKey(s => if (s.canonicalId != null && s.canonicalId.nonEmpty) s.canonicalId else s.entityId)
      .agg(aggregator.toColumn)
      .map { case (id, e) => e.copy(id = id) }
  }

  /** Schema-narrowing fold over the (tiny, sorted) distinct schema set of
    * one entity — runs once per entity, not per statement. */
  private val narrowAllUdf = udf((ss: Seq[String]) =>
    ss.filter(s => s != null && s.nonEmpty).sorted
      .reduceLeftOption(narrow).getOrElse(""))

  /** The schema-narrowing fold as a reusable Column seam, for
    * consumers that need assemble-identical schema resolution without
    * the full assemble (e.g. [[Delta.entityHashes]]' hash-only path). */
  def narrowSchemasCol(distinctSchemas: Column): Column =
    narrowAllUdf(distinctSchemas)

  /** Columnar assemble fast path (A1 at scale): two-level hash
    * aggregation entirely in Catalyst expressions. Level 1 groups on
    * (canonical key, prop) — spreading hot entities across reducers and
    * enabling map-side partial `collect_set`s — level 2 folds the
    * per-prop rows into the entity map. Unlike the typed Aggregator path
    * there is no closure key, so column pruning reaches the scan and no
    * Statement object serde crosses the shuffle. The only non-expression
    * is the once-per-entity schema-narrowing fold.
    *
    * Output schema matches [[Entity]]: (id, schema, properties,
    * datasets, referents, firstSeen, lastSeen).
    *
    * `trustCanonicalId = true` groups on the RAW `canonicalId` column
    * instead of the coalesce-with-entityId expression. Use it when the
    * caller guarantees canonicalId is populated (the ETL runner does —
    * its canonicalize stage writes it on every row): grouping on the
    * plain column lets a statement table bucketed by canonicalId
    * satisfy the aggregation's required distribution directly, so the
    * statements → entities step — the biggest recurring shuffle of a
    * run — executes with NO exchange over pre-bucketed files
    * (StatementIO.writeBucketed; plan-asserted in StatementIOSpec). */
  def assembleColumnar(
      statements: DataFrame,
      trustCanonicalId: Boolean = false): DataFrame = {
    val key =
      if (trustCanonicalId) col("canonicalId")
      else when(col("canonicalId").isNotNull && length(col("canonicalId")) > 0,
        col("canonicalId")).otherwise(col("entityId"))
    statements
      .withColumn("_key", key)
      .groupBy(col("_key"), col("prop"))
      .agg(
        collect_set(col("value")).as("vals"),
        collect_set(col("schema")).as("schemas"),
        collect_set(col("dataset")).as("ds"),
        collect_set(col("entityId")).as("refs"),
        min(col("firstSeen")).as("fs"),
        max(col("lastSeen")).as("ls"))
      .groupBy(col("_key"))
      .agg(
        // collect_list skips null inputs, so the BASE existence prop rows
        // contribute schema/provenance but no property entry
        map_from_entries(array_sort(collect_list(
          when(col("prop") =!= lit(Statement.Base) && size(col("vals")) > 0,
            struct(col("prop").as("key"), array_sort(col("vals")).as("value"))))))
          .as("properties"),
        narrowAllUdf(array_distinct(flatten(collect_list(col("schemas"))))).as("schema"),
        array_sort(array_distinct(flatten(collect_list(col("ds"))))).as("datasets"),
        array_sort(array_distinct(flatten(collect_list(col("refs"))))).as("referents"),
        min(col("fs")).as("firstSeen"),
        max(col("ls")).as("lastSeen"))
      .select(col("_key").as("id"), col("schema"), col("properties"),
        col("datasets"), col("referents"), col("firstSeen"), col("lastSeen"))
  }
}
