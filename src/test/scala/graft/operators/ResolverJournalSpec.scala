package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResolverJournalSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val t2 = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")

  private def emptyJournal =
    Seq.empty[(String, String, String, String, java.sql.Timestamp)]
      .toDF("a", "b", "judgement", "user", "decided_at")

  test("merge then explode: the latest judgement wins") {
    val j1 = Resolver.merge(emptyJournal, "x", "y", "analyst", t1)
    val nodes = Seq("x", "y", "z").toDF("id")
    val c1 = Resolver.canonicalize(nodes, j1)
      .as[(String, String)].collect().toMap
    assert(c1("x") == "x" && c1("y") == "x" && c1("z") == "z")

    val j2 = Resolver.explodeCluster(j1, Seq("x"), "reviewer", t2)
    val c2 = Resolver.canonicalize(nodes, j2)
      .as[(String, String)].collect().toMap
    assert(c2("y") == "y") // dissolved
  }

  test("rekey records a positive old<->new decision") {
    val j = Resolver.rekey(emptyJournal, "old-1", "new-1", "migration", t1)
    val c = Resolver.canonicalize(Seq("old-1", "new-1").toDF("id"), j)
      .as[(String, String)].collect().toMap
    assert(c("old-1") == c("new-1"))
  }

  test("schema filter expands to the subtree") {
    val ents = Seq(("a", "Company"), ("b", "Person"), ("c", "PublicBody"))
      .toDF("id", "schema")
    val orgs = Resolver.schemaFilter(ents, "Organization")
      .select("id").as[String].collect().toSet
    assert(orgs == Set("a", "c"))
  }

  test("position categorisation upserts pending rows for new positions") {
    val positions = Seq("p1", "p2", "p3").toDF("position_id")
    val state = Seq(("p1", "approved", "alice")).toDF("position_id", "category", "reviewed_by")
    val (categorized, newRows) = Positions.categorize(positions, state)
    val cats = categorized.select("position_id", "category")
      .as[(String, String)].collect().toMap
    assert(cats == Map("p1" -> "approved", "p2" -> "pending", "p3" -> "pending"))
    assert(newRows.select("position_id").as[String].collect().toSet == Set("p2", "p3"))
  }

  test("case-variant name reduction keeps the best-cased form") {
    val kept = Seq(1).toDF("x")
      .select(Consolidate.reduceCaseVariants(
        lit(Array("ACME CORP", "Acme Corp", "Other Name"))).as("r"))
      .as[Seq[String]].collect()(0)
    assert(kept.toSet == Set("Acme Corp", "Other Name"))
  }

  test("dom hash ignores prose but catches layout changes") {
    val page1 = "<html><body><table><tr><td>John</td></tr></table></body></html>"
    val page2 = "<html><body><table><tr><td>Jane</td></tr></table></body></html>"
    val page3 = "<html><body><div><tr><td>John</td></tr></div></body></html>"
    def h(s: String) = Seq(s).toDF("h")
      .select(graft.sources.Sources.domHash(col("h"))).as[String].collect()(0)
    assert(h(page1) == h(page2))
    assert(h(page1) != h(page3))
  }
}
