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

  test("plans as partial heap -> exchange -> group-key sort -> final heap") {
    val df = spark.range(100000).select(
      (col("id") % 50).as("g"), col("id"), (col("id") * 37 % 9973).as("v"))
    val out = TopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), k = 5)
    val plan = out.queryExecution.executedPlan.toString
    // the exec node prints as "TopKPerGroup [keys], [order], k, partial"
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2, plan.take(1500))
    assert(plan.contains("Exchange hashpartitioning(g"), plan.take(1500))
    // the final stage streams sorted group runs with ONE live heap, so
    // EnsureRequirements inserts exactly one sort — on the GROUP KEY
    // only (never the ordering columns: nothing ever sorts by v), and
    // ABOVE the exchange, i.e. over the k·groups·partitions partial
    // output, not the corpus
    assert("Sort \\[".r.findAllIn(plan).size == 1, plan.take(1500))
    assert(plan.contains("Sort [g#"), plan.take(1500))
    assert(!plan.contains("Sort [v#"), plan.take(1500))
    assert(plan.indexOf("Sort [g#") < plan.indexOf("Exchange hashpartitioning"),
      plan.take(1500)) // sort consumes the exchange output (printed above it)
    // and the result is right
    assert(out.count() == 250)
  }

  test("partial stage flushes at the buffer bound without changing results") {
    // 5000 rows, 40 groups: with the production FlushRows (1M) nothing
    // flushes mid-partition; the semantics contract is that EARLY
    // flushes are invisible because the final stage re-merges. Assert
    // it by checking the merged result is identical to the window form
    // even when the input arrives in many partitions (each partial map
    // emits independently — the degenerate form of flushing).
    val rnd = new scala.util.Random(77)
    val rows = Seq.fill(5000)((rnd.nextInt(40).toLong, rnd.nextLong(), rnd.nextInt(500)))
      .zipWithIndex.map { case ((g, id, v), i) => (g, id + i, v) }
    val df = rows.toDF("g", "id", "v").repartition(16)
    val ours = TopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), k = 3).as[(Long, Long, Int)].collect().toSet
    val want = windowTopK(df, 3).as[(Long, Long, Int)].collect().toSet
    assert(ours == want)
  }

  test("float group keys: 0.0 and -0.0 are ONE group (sort-equal run detection)") {
    // 0.0 and -0.0 are sort-EQUAL but byte-DISTINCT (no
    // NormalizeFloatingNumbers pass runs on custom execs), and Spark's
    // hash expressions normalize -0.0, so both variants land on the
    // same reducer as one sorted run. Byte-equality run detection
    // would split that run into interleaved fragments and emit up to
    // 2k rows; the ordering-based detection emits exactly k.
    val rows = (0 until 100).map(i => (if (i % 2 == 0) 0.0d else -0.0d, i.toLong, i))
    val df = rows.toDF("g", "id", "v").repartition(8)
    val ours = TopK.topKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id")), k = 3).select("id").as[Long].collect().toSet
    assert(ours == Set(99L, 98L, 97L), s"got $ours")
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
