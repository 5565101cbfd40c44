package graft.sources

import graft.SparkSpec
import graft.model.Statement
import graft.operators.{Delta, EntityAssembler, Exporters, Statistics, Validators}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end fixture pipeline (SURVEY §7 step 4, mirroring
  * zavod/zavod/tests/test_store.py:8-35 and
  * tests/exporters/test_exporters.py:28-60): CSV fixture → ingestion →
  * statements → assembled entities → exports, with first_seen
  * preservation across two runs.
  */
class IngestionPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureCsv: String = {
    val dir = Files.createTempDirectory("graft-fixture")
    val f = dir.resolve("dataset.csv")
    Files.writeString(f,
      """id,type,name,dob,country,topics
        |john-doe,Person,John  Doe,1975-04-02,Germany,role.pep
        |jane-roe,Person,Jane Roe,1980,France,
        |umbrella,Company,Umbrella Corp,,Germany,sanction
        |bad-name,Person,7,,Paraguay,
        |""".stripMargin)
    f.toString
  }

  private def run(runTime: String) = {
    val rows = Sources.csv(spark, fixtureCsv)
    Ingestion.emit(
      rows,
      dataset = "osv",
      schema = col("type"),
      keyParts = Seq(col("id")),
      props = Seq(
        Ingestion.PropMapping("name", "name", col("name")),
        Ingestion.PropMapping("birthDate", "date", col("dob")),
        Ingestion.PropMapping("country", "country", col("country")),
        Ingestion.PropMapping("topics", "topic", col("topics"))),
      runTime = lit(runTime))
  }

  test("csv fixture crawls into statements and entities by schema") {
    val emitted = run("2026-01-01 00:00:00")
    val stmts = Ingestion.toStatements(emitted)
    val entities = EntityAssembler.assembleColumnar(stmts)

    val bySchema = entities.groupBy($"schema").count()
      .as[(String, Long)].collect().toMap
    assert(bySchema == Map("Person" -> 3, "Company" -> 1))

    // the invalid name ('7') was rejected with a warning but the entity
    // survives through its other props
    val warnings = emitted.filter($"warning".isNotNull)
      .select($"warning").as[String].collect().toSeq
    assert(warnings.contains("invalid_name"))

    // entity ids are deterministic slugs
    val ids = entities.select($"id").as[String].collect().toSet
    assert(ids.contains("osv-john-doe"))

    // name squashing happened in value_clean
    val john = entities.filter($"id" === "osv-john-doe")
      .select(element_at(element_at($"properties", "name"), 1))
      .as[String].collect()(0)
    assert(john == "John Doe")

    // topics make the sanctioned company a target
    val targets = entities.filter(
      arrays_overlap(coalesce(element_at($"properties", "topics"),
        array().cast("array<string>")), array(lit("sanction"))))
      .select($"id").as[String].collect().toSeq
    assert(targets == Seq("osv-umbrella"))
  }

  test("first_seen survives a re-run; statistics and exports flow") {
    val run1 = Ingestion.toStatements(run("2026-01-01 00:00:00"))
    val run2 = Ingestion.toStatements(run("2026-02-01 00:00:00"))
    val preserved = Delta.preserveFirstSeen(run2, run1, lit("2026-02-01 00:00:00").cast("timestamp"))
    val firstSeens = preserved.select(date_format($"firstSeen", "yyyy-MM-dd"))
      .distinct().as[String].collect().toSeq
    assert(firstSeens == Seq("2026-01-01")) // statement ids matched -> inherited

    val entities = EntityAssembler.assembleColumnar(preserved)
    val json = entities.select(Exporters.ftmJsonLine($"id", $"schema", $"properties"))
      .as[String].collect()
    assert(json.forall(j => j.startsWith("{\"id\":\"osv-") && j.endsWith("}}")))

    val facets = Statistics.facets(entities.withColumn("schema", $"schema"),
      Seq("schema" -> "schema")).as[(String, String, Long)].collect()
    assert(facets.toSet == Set(("schema", "Person", 3L), ("schema", "Company", 1L)))

    val stats = Ingestion.crawlStats(run("2026-01-01 00:00:00"))
      .as[(String, Long, Long, Long)].collect()(0)
    assert(stats._1 == "osv" && stats._2 == 4)

    val audit = Validators.unconsumedColumns(
      Sources.csv(spark, fixtureCsv), Set("id", "type", "name", "dob", "country", "topics"))
    assert(audit.isEmpty)
  }
}
