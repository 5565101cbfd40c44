package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-style equivalence checks for the round-12 rewrite claims,
  * on RANDOMIZED inputs rather than the oracle fixture alone:
  *
  *  - q255's aggregation rewrite of the TPC-H Q21 double quantifier
  *    (per-(order, supplier) counts) must equal the direct semi/anti
  *    join encoding of EXISTS / NOT EXISTS on arbitrary data;
  *  - q253's cluster-safe split invariant: two documents in the same
  *    near-dup component NEVER land in different splits.
  */
class RewriteEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def lineitems(seed: Long, n: Int): DataFrame = {
    // deterministic pseudo-random (order, supplier, flag) triples with
    // plenty of multi-supplier orders and R-flag collisions
    (0 until n).map { i =>
      val h = (i * 2654435761L + seed) & 0x7fffffffL
      val order = h % 97
      val supp = (h / 97) % 13
      val flag = if ((h / 1261) % 3 == 0) "R" else "N"
      (order, supp, flag)
    }.toDF("l_orderkey", "l_suppkey", "l_returnflag")
  }

  private def rewriteForm(li: DataFrame): DataFrame = {
    val os = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r"))
    val perOrder = os.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("n_r") > 0, 1L).otherwise(0L)).as("n_supp_r"))
    os.filter(col("n_r") > 0)
      .join(perOrder, "l_orderkey")
      .filter(col("n_supp") > 1 && col("n_supp_r") === 1)
      .groupBy(col("l_suppkey")).agg(sum(col("n_r")).as("numwait"))
  }

  private def quantifierForm(li: DataFrame): DataFrame = {
    // the textbook shape: per offending line, EXISTS another supplier's
    // line on the order (semi) and NOT EXISTS another supplier's
    // offending line (anti)
    val l1 = li.filter(col("l_returnflag") === "R")
    val other = li.select(col("l_orderkey"), col("l_suppkey").as("s2"))
    val otherR = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey").as("s3"))
    l1.join(other, l1("l_orderkey") === other("l_orderkey") &&
        l1("l_suppkey") =!= col("s2"), "left_semi")
      .join(otherR, l1("l_orderkey") === otherR("l_orderkey") &&
        l1("l_suppkey") =!= col("s3"), "left_anti")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
  }

  test("Q21 aggregation rewrite equals the semi/anti quantifier form on random data") {
    for (seed <- Seq(1L, 42L, 987L)) {
      val li = lineitems(seed, 5000)
      val a = rewriteForm(li)
      val b = quantifierForm(li)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"rewrite mismatch at seed $seed")
    }
  }

  test("cluster-safe split: same near-dup component implies same split") {
    // random docs with planted near-dup families (shared text templates)
    val docs = (0 until 600).map { i =>
      val fam = i % 83 // ~7 docs per family share a template
      val words = (0 until 24).map(j => s"f${fam}w$j")
      // family members diverge by one trailing token so they're
      // near-dups, not exact dups
      (i.toLong, (words :+ s"tail$i").mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      n = 3, maxDf = 1000, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
    val labels = ConnectedComponents.run(
      docs.select(col("doc_id").as("id")),
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val split = Sampling.assignSplits(
      labels.select(col("id").as("doc_id"), col("component")),
      col("component"), "graft",
      Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
    val violating = split.groupBy("component")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1).count()
    assert(violating === 0L, "a component straddles the split fence")
    // sanity: the splitter actually has multi-member components to protect
    val multi = split.groupBy("component").count().filter(col("count") > 1).count()
    assert(multi > 50, s"fixture degenerate: only $multi multi-doc components")
  }
}
