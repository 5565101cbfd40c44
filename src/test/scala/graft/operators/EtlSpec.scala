package graft.operators

import graft.SparkSpec
import graft.etl.Etl
import graft.operators.Validators.Assertion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integration spec for the end-to-end ETL runner (the `zavod run`
  * analog — zavod/zavod/cli/etl.py:95-154): publish layout, assertion
  * gate fail-fast, first_seen preservation + delta across versions,
  * canonicalization through the resolver journal, and release of the
  * shared entity cache.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private def stmts(rows: Seq[(String, String, String, String)], ts: String): DataFrame =
    rows.toDF("entityId", "prop", "value", "schema")
      .select(
        md5(concat_ws("|", lit("t"), col("entityId"), col("prop"), col("value"))).as("id"),
        col("entityId"), col("entityId").as("canonicalId"),
        col("prop"), col("schema"), col("value"),
        lit("t").as("dataset"), lit("en").as("lang"), lit("crawl").as("origin"),
        col("value").as("originalValue"),
        lit(ts).cast("timestamp").as("firstSeen"),
        lit(ts).cast("timestamp").as("lastSeen"),
        lit(false).as("external"))

  private val noDecisions =
    Seq.empty[(String, String, String, String, java.sql.Timestamp)]
      .toDF("a", "b", "judgement", "user", "decided_at")

  private def tmpRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-etl-$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  private val baseRows = Seq(
    ("e1", "name", "Alpha Corp", "Company"),
    ("e1", "country", "de", "Company"),
    ("e2", "name", "Bob Person", "Person"),
    ("e2", "topics", "sanction", "Person"),
    ("e3", "name", "Bob P. Duplicate", "Person"))

  test("run publishes the versioned layout, latest copy and success marker") {
    val root = tmpRoot("publish")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val res = Etl.run(spark, stmts(baseRows, "2025-01-01 00:00:00"), noDecisions,
      Etl.Config("t", "v1", root, "2025-01-01 00:00:00",
        assertions = Seq(Assertion("entity_count", "gte", "", 1L))))
    assert(res.entityCount === 3)
    assert(res.products.size === Etl.DefaultExporters.size)
    for (p <- Etl.DefaultExporters) {
      assert(new java.io.File(s"$root/datasets/v1/t/$p").exists(), s"versioned $p")
      assert(new java.io.File(s"$root/datasets/latest/t/$p").exists(), s"latest $p")
    }
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/datasets/latest/t/_VERSION")), "UTF-8")
    assert(marker === "v1")
    val state = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/state/t/last_successful_version")), "UTF-8")
    assert(state === "v1")
    // single-assembly invariant: the shared entity cache is released
    // (scoped to THIS run — the shared test session may carry other
    // suites' checkpoints)
    assert(spark.sparkContext.getPersistentRDDs.keySet
      .subsetOf(persistedBefore))
  }

  test("fatal GTE assertion aborts before any product is written") {
    val root = tmpRoot("abort")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val ex = intercept[Etl.ValidationFailedException] {
      Etl.run(spark, stmts(baseRows, "2025-01-01 00:00:00"), noDecisions,
        Etl.Config("t", "v1", root, "2025-01-01 00:00:00",
          assertions = Seq(
            Assertion("entity_count", "gte", "", 1000L),
            Assertion("schema_entities", "lte", "Person", 0L)))) // LTE fails but is non-fatal
    }
    // only the GTE failure aborts (validators/assertions.py:156-183)
    assert(ex.failures.size === 1)
    assert(ex.failures.head.contains("entity_count"))
    assert(!new java.io.File(s"$root/datasets/v1/t").exists())
    assert(!new java.io.File(s"$root/state/t/last_successful_version").exists())
    assert(spark.sparkContext.getPersistentRDDs.keySet
      .subsetOf(persistedBefore))
  }

  test("an empty dataset runs to completion with empty products (EmptyValidator analog)") {
    val root = tmpRoot("empty")
    val res = Etl.run(spark, stmts(Seq.empty, "2025-01-01 00:00:00"), noDecisions,
      Etl.Config("t", "v1", root, "2025-01-01 00:00:00"))
    assert(res.entityCount === 0)
    for (p <- Etl.DefaultExporters)
      assert(new java.io.File(s"$root/datasets/latest/t/$p").exists(), s"latest $p")
    assert(spark.read.text(s"$root/datasets/latest/t/entities.ftm.json").count() === 0)
  }

  test("issue log: crawl issues + dangling-ref warnings publish as issues.json and index issue_levels") {
    val root = tmpRoot("issues")
    // e9 references a missing entity via an entity-ref prop
    val rows = baseRows :+ (("e9", "entity", "ghost-id", "Sanction"))
    val crawlIssues = Seq(("t", "error", "bad date in row 7")).toDF("dataset", "level", "message")
    val res = Etl.run(spark, stmts(rows, "2025-01-01 00:00:00"), noDecisions,
      Etl.Config("t", "v1", root, "2025-01-01 00:00:00",
        // a failed LTE assertion warns without aborting
        assertions = Seq(Assertion("schema_entities", "lte", "Person", 1L))),
      crawlIssues = Some(crawlIssues))
    assert(res.danglingRefCount === 1)
    assert(res.products.contains("issues.json"))
    val issueLines = spark.read.text(s"$root/datasets/latest/t/issues.json")
      .as[String].collect().toSeq
    assert(issueLines.size === 3)
    assert(issueLines.exists(l => l.contains("\"error\"") && l.contains("bad date")))
    assert(issueLines.exists(l => l.contains("\"warning\"") && l.contains("ghost-id")))
    assert(issueLines.exists(l => l.contains("assertion failed") && l.contains("schema_entities")))
    val index = spark.read.text(s"$root/datasets/latest/t/index.json")
      .as[String].collect().head
    assert(index.contains(""""issue_levels":{"error":1,"warning":2}"""))
    assert(index.contains(""""issue_count":3"""))
  }

  test("resolver decisions canonicalize; second run preserves first_seen and emits delta ops") {
    val root = tmpRoot("delta")
    Etl.run(spark, stmts(baseRows, "2025-01-01 00:00:00"), noDecisions,
      Etl.Config("t", "v1", root, "2025-01-01 00:00:00"))

    // v2: e3 merged into e2, e1's country changed, e4 added
    val v2Rows = Seq(
      ("e1", "name", "Alpha Corp", "Company"),
      ("e1", "country", "fr", "Company"),
      ("e2", "name", "Bob Person", "Person"),
      ("e2", "topics", "sanction", "Person"),
      ("e3", "name", "Bob P. Duplicate", "Person"),
      ("e4", "name", "New Entity", "Person"))
    val decisions = Seq(("e2", "e3", "POSITIVE", "tester",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("a", "b", "judgement", "user", "decided_at")
    Etl.run(spark, stmts(v2Rows, "2026-01-01 00:00:00"), decisions,
      Etl.Config("t", "v2", root, "2026-01-01 00:00:00",
        previousVersion = Some("v1")))

    val stored = spark.read.parquet(s"$root/statements/v2")
    // canonicalization: e3's statements carry canonical id e2
    assert(stored.filter(col("entityId") === "e3" && col("canonicalId") === "e2")
      .count() === 1)
    // first_seen preserved for unchanged statements, run time for new ones
    val seen = stored.select(col("prop"), col("value"),
        date_format(col("firstSeen"), "yyyy-MM-dd").as("fs"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(seen(("name", "Alpha Corp")) === "2025-01-01")
    assert(seen(("country", "fr")) === "2026-01-01")
    assert(seen(("name", "New Entity")) === "2026-01-01")

    val delta = spark.read.text(s"$root/datasets/latest/t/entities.delta.json")
      .as[String].collect().toSeq
    def opsOf(op: String) = delta.filter(_.startsWith(s"""{"op":"$op"""))
    // e1 changed country → MOD; e4 new → ADD; e2 gained a merged name
    // value → MOD; e3 stopped being its own canonical entity → DEL
    assert(opsOf("ADD").exists(_.contains("\"e4\"")))
    assert(opsOf("MOD").exists(_.contains("\"e1\"")))
    assert(opsOf("MOD").exists(_.contains("\"e2\"")))
    assert(opsOf("DEL").exists(_.contains("\"e3\"")))
    assert(delta.size === 4)

    // the merged entity carries both name values in ftm.json
    val ftm = spark.read.text(s"$root/datasets/latest/t/entities.ftm.json")
      .as[String].collect()
    val e2line = ftm.find(_.contains("\"id\":\"e2\"")).get
    assert(e2line.contains("Bob P. Duplicate") && e2line.contains("Bob Person"))
    assert(!ftm.exists(_.contains("\"id\":\"e3\"")))

    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/datasets/latest/t/_VERSION")), "UTF-8")
    assert(marker === "v2")
  }
}
