package graft.sources

import graft.SparkSpec
import graft.model.Statement
import java.nio.file.Files
import java.sql.Timestamp

class StatementIOSpec extends SparkSpec {
  import spark.implicits._

  private def stmt(id: String, ds: String, prop: String, external: Boolean) =
    Statement(id, "e1", "e1", prop, "Person", "v", ds, "en", "crawl", "v",
      Timestamp.valueOf("2026-01-01 00:00:00"),
      Timestamp.valueOf("2026-01-01 00:00:00"), external)

  test("S1-S3: versioned partitioned write, pruned scan, time travel") {
    val root = Files.createTempDirectory("graft-stio").toString
    val v1 = Seq(stmt("a", "ds1", "name", external = false),
      stmt("b", "ds2", "name", external = false),
      stmt("c", "ds1", "name", external = true)).toDS()
    val v2 = Seq(stmt("d", "ds1", "name", external = false)).toDS()
    StatementIO.write(v1, root, "v1")
    StatementIO.write(v2, root, "v2")

    // collection scan prunes to the member datasets + external filter
    val scanned = StatementIO.scan(spark, root, "v1", Seq("ds1"))
      .map(_.id).collect().toSet
    assert(scanned == Set("a")) // c is external, b is another dataset

    val withExternal = StatementIO.scan(spark, root, "v1", Seq("ds1"),
      includeExternal = true).map(_.id).collect().toSet
    assert(withExternal == Set("a", "c"))

    // S3: previous-version scan reads the older snapshot untouched
    val prev = StatementIO.scanVersion(spark, root, "v1").map(_.id).collect().toSet
    val curr = StatementIO.scanVersion(spark, root, "v2").map(_.id).collect().toSet
    assert(prev == Set("a", "b", "c") && curr == Set("d"))
  }

  test("bucketed statement tables join on canonicalId without a shuffle") {
    val stmts = Seq(stmt("a", "ds1", "name", external = false),
      stmt("b", "ds1", "alias", external = false)).toDS()
    StatementIO.writeBucketed(stmts, "stmts_v1", buckets = 4)
    StatementIO.writeBucketed(stmts, "stmts_v2", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val joined = spark.table("stmts_v1").as("l")
        .join(spark.table("stmts_v2").as("r"), "canonicalId")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed scans: a sort-merge join with NO exchange
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        plan.take(1000))
      assert(joined.count() == 4) // both rows share canonicalId e1: 2x2
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed store assembles entities with no exchange (trusted canonicalId)") {
    val stmts = Seq(stmt("a", "ds1", "name", external = false),
      stmt("b", "ds1", "alias", external = false)).toDS()
    StatementIO.writeBucketed(stmts, "stmts_asm", buckets = 4)
    val trusted = graft.operators.EntityAssembler
      .assembleColumnar(spark.table("stmts_asm"), trustCanonicalId = true)
    val plan = trusted.queryExecution.executedPlan.toString
    // the statements → entities aggregation — the biggest recurring
    // shuffle of a run — satisfies its distribution from the bucketing
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    // and produces the same entities as the untrusted-key path
    val untrusted = graft.operators.EntityAssembler
      .assembleColumnar(spark.table("stmts_asm"))
    assert(trusted.collect().toSet == untrusted.collect().toSet)
  }

  test("K2: statements CSV export skips the BASE existence prop") {
    val root = Files.createTempDirectory("graft-csv").toString
    val stmts = Seq(stmt("a", "ds1", "name", external = false),
      stmt("b", "ds1", Statement.Base, external = false)).toDS()
    StatementIO.exportCsv(stmts, s"$root/out")
    val back = spark.read.option("header", "true").csv(s"$root/out")
    assert(back.count() == 1)
    assert(back.select("prop").as[String].collect().toSeq == Seq("name"))
    // FtM CSVStatementWriter column order with the derived prop_type
    assert(back.columns.toSeq == Seq("id", "entity_id", "canonical_id",
      "prop", "prop_type", "schema", "value", "original_value", "dataset",
      "lang", "origin", "external", "first_seen", "last_seen"))
    assert(back.select("prop_type").as[String].collect().toSeq == Seq("name"))
  }
}
