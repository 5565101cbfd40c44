package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConsolidateSpec extends SparkSpec {
  import spark.implicits._

  test("prefix dates: partials covered by fuller dates are dropped") {
    val df = Seq((1, Seq("1990", "1990-05", "1990-05-01", "1991", "2000-03")))
      .toDF("id", "vals")
    val out = df.select(Consolidate.simplifyPrefixDates(col("vals")).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("1990-05-01", "1991", "2000-03"))
  }

  test("prefix dates: no-op when nothing is a prefix") {
    val df = Seq((1, Seq("1990-01-01", "1990-01-02"))).toDF("id", "vals")
    val out = df.select(Consolidate.simplifyPrefixDates(col("vals")).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("1990-01-01", "1990-01-02"))
  }

  test("full date simplification strips the HISTORIC sentinel") {
    val df = Seq((1, Seq("historical", "1990", "1990-05"))).toDF("id", "vals")
    val out = df.select(Consolidate.simplifyDates(col("vals")).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("1990-05")) // prefix dropped AND sentinel removed
  }

  test("partial date bounds expand year and month") {
    val df = Seq(("1990", "1990-05", "1990-05-17", "")).toDF("y", "m", "d", "e")
    val r = df.select(
      Consolidate.partialDateLower(col("y")), Consolidate.partialDateUpper(col("y")),
      Consolidate.partialDateLower(col("m")), Consolidate.partialDateUpper(col("m")),
      Consolidate.partialDateLower(col("d")), Consolidate.partialDateUpper(col("d")),
      Consolidate.partialDateLower(col("e")), Consolidate.partialDateUpper(col("e"))
    ).as[(String, String, String, String, String, String, String, String)].head()
    assert(r == (("1990-01-01", "1990-12-31", "1990-05-01", "1990-05-31",
      "1990-05-17", "1990-05-17", "0000-01-01", "9999-12-31")))
  }

  test("interval overlap honors wildcards and partial precision") {
    val cases = Seq(
      ("1990", "1991", "1991-06", "1992", true),   // touch at 1991
      ("1990", "1990", "1991", "1992", false),     // disjoint years
      ("", "", "2020-05", "2020-05", true),        // wildcard matches anything
      ("2020-01", "2020-03", "2020-03-31", "2020-04", true),
      ("2020-01", "2020-02", "2020-03-01", "2020-04", false)
    ).toDF("as", "ae", "bs", "be", "expected")
    val bad = cases.withColumn("got",
        Consolidate.intervalsOverlap(col("as"), col("ae"), col("bs"), col("be")))
      .filter(col("got") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("weak name reduction drops case-insensitive duplicates of strong names") {
    val df = Seq((Seq("Vladimir Putin"), Seq("VLADIMIR PUTIN", "Putin V."))).toDF("strong", "weak")
    val out = df.select(Consolidate.reduceWeakNames(col("strong"), col("weak")).as("kept"))
      .as[Seq[String]].head()
    assert(out == Seq("Putin V."))
  }

  test("undirected edge key is order-insensitive") {
    val df = Seq(("a", "b"), ("b", "a")).toDF("s", "t")
    val keys = df.select(Consolidate.undirectedKey(col("s"), col("t")).as("k"))
      .as[String].collect().toSet
    assert(keys == Set("a|b"))
  }
}
