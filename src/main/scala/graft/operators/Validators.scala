package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset validators (J7/J8, A3, K13, P8, assertions) — the quality
  * gate the reference runs between store-sync and export
  * (zavod/zavod/validators/__init__.py:15-60,
  * validators/assertions.py:28-183, meta/assertion.py:8-96,
  * runtime/issues.py:26-106).
  */
object Validators {

  /** J7: dangling references — entity-ref values that resolve to no
    * entity. Anti-join of the edge frame against the id set. */
  def danglingRefs(entities: DataFrame): DataFrame =
    Adjacency.refEdges(entities)
      .join(entities.select(col("id").as("dst_id")), Seq("dst_id"), "left_anti")
      .select(col("src_id"), col("prop"), col("dst_id"))

  /** J8: self-references one level deep — A references B and B
    * references A back through a different property (FtM forbids direct
    * self-refs, so the check is two-hop —
    * validators/__init__.py:31-46). `excludePairs` models reverse-prop
    * pairs that are legitimate (prop, otherProp). */
  def selfReferences(
      entities: DataFrame,
      excludePairs: Set[(String, String)] = Set.empty): DataFrame = {
    val e = Adjacency.refEdges(entities)
    val back = e.select(col("src_id").as("b_src"), col("prop").as("other_prop"),
      col("dst_id").as("b_dst"))
    val pairs = e.join(back,
      col("dst_id") === col("b_src") && col("src_id") === col("b_dst"))
    val excluded = excludePairs.foldLeft(lit(false)) { case (acc, (p, q)) =>
      acc || (col("prop") === p && col("other_prop") === q)
    }
    pairs.filter(!excluded)
      .select(col("src_id").as("id"), col("prop"),
        col("dst_id").as("other_id"), col("other_prop"))
  }

  /** One assertion row: min (GTE ⇒ fatal on failure) or max (LTE ⇒ warn)
    * over a metric (meta/assertion.py:30-64). `key` scopes
    * schema_entities / country_entities; empty for global metrics. */
  final case class Assertion(
      metric: String,      // entity_count | schema_entities | country_entities | countries
      comparison: String,  // gte | lte
      key: String,
      threshold: Long)

  /** Evaluate assertions against an entity frame. Fatal = failed GTE
    * (validators/assertions.py:156-183: only min assertions abort).
    * Output: (metric, key, comparison, threshold, actual, passed,
    * fatal). */
  def checkAssertions(
      entities: DataFrame,
      assertions: Seq[Assertion]): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    val spec = assertions.map(a => (a.metric, a.comparison, a.key, a.threshold))
      .toDF("metric", "comparison", "key", "threshold")

    val total = entities.agg(count(lit(1)).as("actual"))
      .select(lit("entity_count").as("metric"), lit("").as("key"), col("actual"))
    val bySchema = entities.groupBy(col("schema").as("key"))
      .agg(count(lit(1)).as("actual"))
      .select(lit("schema_entities").as("metric"), col("key"), col("actual"))
    val countries = entities
      .select(explode(coalesce(element_at(col("properties"), "country"),
        array().cast("array<string>"))).as("key"), col("id"))
    val byCountry = countries.groupBy("key")
      .agg(countDistinct(col("id")).as("actual"))
      .select(lit("country_entities").as("metric"), col("key"), col("actual"))
    val countryCount = countries.agg(countDistinct(col("key")).as("actual"))
      .select(lit("countries").as("metric"), lit("").as("key"), col("actual"))

    val metrics = total.unionByName(bySchema).unionByName(byCountry)
      .unionByName(countryCount)
    // broadcast the metrics side: it's the build side of the left join
    // (a preserved-side broadcast hint is unsupported and silently
    // dropped), and it stays small at any corpus size — one row per
    // metric × schema/country, not per entity
    spec.join(broadcast(metrics), Seq("metric", "key"), "left")
      .withColumn("actual", coalesce(col("actual"), lit(0L)))
      .withColumn("passed",
        when(col("comparison") === "gte", col("actual") >= col("threshold"))
          .otherwise(col("actual") <= col("threshold")))
      .withColumn("fatal", !col("passed") && col("comparison") === "gte")
      .select(col("metric"), col("key"), col("comparison"), col("threshold"),
        col("actual"), col("passed"), col("fatal"))
  }

  /** A3/K13: issue log consolidation — counts per level, with each
    * level's share of the total (runtime/issues.py:91-98). */
  def issueCounts(issues: DataFrame, levelCol: String): DataFrame = {
    val counts = issues.groupBy(col(levelCol).as("level"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_t"))
    counts.crossJoin(broadcast(total))
      .select(col("level"), col("n"),
        (col("n").cast("double") / col("_t").cast("double")).as("share"))
  }

  /** P8: column pop-audit — source columns never consumed by the
    * ingestion mapping (context.py:600-620). Driver-side assertion. */
  def unconsumedColumns(source: DataFrame, consumed: Set[String]): Seq[String] =
    source.columns.filterNot(consumed.contains).toSeq.sorted

  /** Schema-conflict report: entities whose statements carry schemata
    * with NO common schema in the lattice. The assembler narrows with a
    * deterministic fallback instead of raising (the reference raises
    * InvalidData — entity.py:155-162); this surfaces those entities so
    * the conflict is observable rather than silently absorbed. */
  def schemaConflicts(statements: DataFrame): DataFrame = {
    import graft.model.FtmModel
    val conflicted = udf((ss: Seq[String]) => {
      val distinct = ss.filter(s => s != null && s.nonEmpty).distinct.sorted
      distinct.combinations(2).exists {
        case Seq(a, b) => FtmModel.commonSchema(a, b).isEmpty
        case _ => false
      }
    })
    val key = when(col("canonicalId").isNotNull && length(col("canonicalId")) > 0,
      col("canonicalId")).otherwise(col("entityId"))
    statements
      .groupBy(key.as("id"))
      .agg(array_sort(collect_set(col("schema"))).as("schemata"))
      .filter(conflicted(col("schemata")))
      .select(col("id"), array_join(col("schemata"), ";").as("schemata"))
  }

  /** Catalog hierarchy audit (contrib/check_hierarchy.py:20-42): the
    * two warnings the runbook emits over the dataset catalog —
    *
    *  - `no_children_no_entry_point`: a dataset that is neither a
    *    parent (no children) nor crawlable (no entry_point) can never
    *    produce or aggregate data;
    *  - `not_in_any_collection`: a non-collection, non-disabled
    *    dataset that no collection includes is published nowhere.
    *
    * `catalog` is one row per dataset (name, is_collection, disabled,
    * entry_point nullable); `children` the (collection, child)
    * membership edges (the YAML's nested child list, normalized —
    * the relational form a 10k-dataset catalog diffs and joins
    * cheaply). The script's first-loop `continue` does not change
    * semantics: a collection it skips has no children to contribute,
    * so the second warning's child set is simply ALL membership edges.
    * Both checks are metadata-sized anti-joins; a dataset can carry
    * both issues (the script's loops warn independently). */
  def checkHierarchy(catalog: DataFrame, children: DataFrame): DataFrame = {
    val parents = children.select(col("collection").as("name")).distinct()
    val noKids = catalog.join(parents, Seq("name"), "left_anti")
      .filter(col("entry_point").isNull)
      .select(col("name"), lit("no_children_no_entry_point").as("issue"))
    val uncollected = catalog.filter(!col("is_collection") && !col("disabled"))
      .join(children.select(col("child").as("name")).distinct(),
        Seq("name"), "left_anti")
      .select(col("name"), lit("not_in_any_collection").as("issue"))
    noKids.unionByName(uncollected)
  }
}
