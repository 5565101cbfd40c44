package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .where(col("rn") <= k).drop("rn")

  test("topKPerGroup equals the window encoding on random data") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(5000)((rnd.nextInt(20).toLong, rnd.nextLong(), rnd.nextInt(1000)))
      .zipWithIndex.map { case ((g, id, v), i) => (g, id + i, v) } // unique ids
    val df = rows.toDF("g", "id", "v")
    val ours = TopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), k = 7)
      .as[(Long, Long, Int)].collect().toSet
    val want = windowTopK(df, 7).as[(Long, Long, Int)].collect().toSet
    assert(ours == want)
  }

  test("groups smaller than k, single-row groups, and k=1 all match") {
    val df = Seq((1L, 1L, 5), (1L, 2L, 9), (2L, 3L, 1)).toDF("g", "id", "v")
    for (k <- Seq(1, 2, 10)) {
      val ours = TopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), k).as[(Long, Long, Int)].collect().toSet
      val want = windowTopK(df, k).as[(Long, Long, Int)].collect().toSet
      assert(ours == want, s"k=$k")
    }
  }

  test("plans as partial heap -> hash exchange -> final heap; no sort anywhere") {
    val df = spark.range(100000).select(
      (col("id") % 50).as("g"), col("id"), (col("id") * 37 % 9973).as("v"))
    val out = TopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    // the exec node prints as "TopKPerGroup [keys], [order], k, partial"
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2, plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(g"), plan.take(1500))
    assert(!plan.contains("Sort "), plan.take(1500)) // never a group sort
    // and the result is right
    assert(out.count() == 250)
  }

  test("the exchange carries at most k rows per (group, input partition)") {
    // 100k rows, 10 groups, 8 input partitions: the window form would
    // shuffle all 100k rows; the partial heap forwards <= 10*8*5 = 400
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = spark.range(100000).repartition(8).select(
        (col("id") % 10).as("g"), col("id"), (col("id") % 7919).as("v"))
      val out = TopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), k = 5)
      val partial = out.queryExecution.executedPlan.collect {
        case e: TopKPerGroupExec if e.partial => e
      }
      assert(partial.nonEmpty)
      val forwarded = partial.head.execute().count()
      assert(forwarded <= 10L * 8L * 5L, s"forwarded=$forwarded")
      assert(forwarded >= 10L * 5L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
