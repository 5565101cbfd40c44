package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout family: zone-map skipping equivalence, Z-order locality, and
  * compaction-plan invariants — plus the plan locks the scale story
  * depends on (broadcast candidate join, no corpus-wide window in the
  * compaction prefix sum). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zInterleave is a bijection on the 6-bit grid and orders by curve") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", Layout.zInterleave(col("x"), col("y"), 6))
    val zs = df.select("z").as[Long].collect()
    assert(zs.distinct.length === 64 * 64)
    assert(zs.min === 0L && zs.max === 64L * 64 - 1)
    // the defining property: z restricted to y=0 interleaves to even
    // bit positions only
    val xOnly = df.where(col("y") === 0).select("x", "z").as[(Long, Long)].collect()
    xOnly.foreach { case (x, z) =>
      var acc = 0L
      for (i <- 0 until 6) acc += ((x >> i) & 1L) << (2 * i)
      assert(z === acc)
    }
  }

  test("zone-map skipped scan equals the full-scan filter") {
    val rows = (0L until 2000L).map(i => (i, i * 10 + (i % 7), (i % 13).toDouble))
    val df = rows.toDF("id", "k", "v")
    val withFile = df.withColumn("file_id", expr("id div 100"))
    val zm = Layout.zoneMap(withFile, col("file_id"), Seq("k" -> col("k")))
    val lo = lit(5000L); val hi = lit(7000L)
    val cands = Layout.candidateFiles(zm, "k", lo, hi)
    // time-clustered key → most files pruned
    val nCand = cands.count()
    assert(nCand < 5, s"expected <5 candidate files, got $nCand")
    val skipped = Layout.skipScan(df, expr("id div 100"), cands,
      col("k") >= lo && col("k") <= hi)
    val full = df.where(col("k") >= lo && col("k") <= hi)
    assert(skipped.select("id").as[Long].collect().sorted
      === full.select("id").as[Long].collect().sorted)
  }

  test("skipScan joins the candidate list as a broadcast") {
    val df = (0L until 1000L).map(i => (i, i * 3)).toDF("id", "k")
    val zm = Layout.zoneMap(df.withColumn("file_id", expr("id div 100")),
      col("file_id"), Seq("k" -> col("k")))
    val cands = Layout.candidateFiles(zm, "k", lit(0L), lit(500L))
    val plan = Layout.skipScan(df, expr("id div 100"), cands, col("k") >= 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("zorderReport covers all rows with bounded per-file rectangles") {
    val rows = (0L until 4096L).map(i => (i % 97, i % 89))
    val rep = Layout.zorderReport(rows.toDF("a", "b"),
      col("a"), col("b"), bits = 6, filesLog2 = 4)
    val stats = rep.collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum === 4096L)
    // 4 file bits over a 6+6-bit curve → each file covers a z-range of
    // 256 cells; the enclosing rectangle of any such range spans at
    // most 32 cells per side (top 2 bits of each dim fixed → 16x16,
    // plus boundary slack — assert the hard curve bound)
    stats.foreach { r =>
      assert(r.getAs[Long]("span_x") <= 31, r.toString)
      assert(r.getAs[Long]("span_y") <= 31, r.toString)
    }
  }

  test("compaction plan: contiguous offsets, target-bounded groups, oversized kept whole") {
    val frags = Seq(
      ("a", 0L, 40L), ("a", 1L, 40L), ("a", 2L, 250L), // oversized
      ("a", 3L, 40L), ("b", 0L, 60L), ("b", 1L, 60L), ("b", 2L, 10L))
      .toDF("source", "frag_idx", "bytes")
    val plan = Layout.compactionPlan(frags, targetBytes = 100L)
      .orderBy("source", "frag_idx").collect()
    // start offsets are the global cumsum in (source, frag_idx) order
    var off = 0L
    plan.foreach { r =>
      assert(r.getAs[Long]("start_off") === off, r.toString)
      off += r.getAs[Long]("bytes")
    }
    // group = start div target; every group except ones holding an
    // oversized fragment stays <= target + one straddling fragment
    val byGroup = plan.groupBy(_.getAs[Long]("out_group"))
    byGroup.foreach { case (_, rs) =>
      val bytes = rs.map(_.getAs[Long]("bytes")).sum
      assert(rs.head.getAs[Long]("group_bytes") === bytes)
      if (rs.forall(_.getAs[Long]("bytes") <= 100L))
        assert(bytes <= 100L + rs.map(_.getAs[Long]("bytes")).max)
    }
    // the 250-byte fragment keeps its own group (never split)
    val big = plan.find(_.getAs[Long]("bytes") === 250L).get
    assert(byGroup(big.getAs[Long]("out_group")).map(_.getAs[Long]("bytes")).sum >= 250L)
  }

  test("bloom filter: no false negatives, bounded false positives, shuffle-free probe") {
    val build = (0L until 500L).map(i => i * 3).toDF("key")
    val bits = Bloom.buildBits(build, col("key"), m = 65536, k = 3, salt = "t")
    val probe = (0L until 3000L).toDF("key")
    val flagged = Bloom.mightContain(probe, col("key"), bits, 65536, 3, "t")
    val rows = flagged.select("key", "bloom_pass").as[(Long, Boolean)].collect()
    val members = build.as[Long].collect().toSet
    // every member passes
    rows.filter(r => members(r._1)).foreach(r => assert(r._2, s"false negative ${r._1}"))
    // false positives exist only below a loose bound (m=64Ki, n=1500 inserts)
    val fps = rows.count(r => !members(r._1) && r._2)
    assert(fps < 100, s"fp count $fps out of bounds")
    // probe plan: broadcast joins only, no Exchange on the probe side
    val plan = flagged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), plan.take(600))
  }

  test("clusteredWrite produces disjoint per-file key envelopes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster").toString
    val df = (0L until 5000L).map(i => (i * 2654435761L % 100000L, i))
      .toDF("k", "payload")
    Layout.clusteredWrite(df, partitions = 8, s"$dir/t", col("k"))
    val back = spark.read.parquet(s"$dir/t")
      .select(col("k"), input_file_name().as("f"))
    val envelopes = back.groupBy("f")
      .agg(min("k").as("lo"), max("k").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(envelopes.length > 1)
    // range partitioning => file envelopes never overlap: every range
    // predicate prunes via the zone map to O(1) files
    envelopes.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, envelopes.toSeq)
      case _ =>
    }
    // and all rows survive the layout
    assert(back.count() === 5000L)
  }

  test("compaction prefix sum has no corpus-wide ordered window") {
    val frags = (0L until 1000L).map(i => (s"s${i % 7}", i, 50L))
      .toDF("source", "frag_idx", "bytes")
    val plan = Layout.compactionPlan(frags, 1000L).queryExecution.executedPlan.toString
    // the only unpartitioned window runs over the per-source totals
    // frame (7 rows); the per-fragment running sum is partitioned
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty)
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("adviseColumnIndex: value_set iff no file overflowed the cap") {
    import spark.implicits._
    val fits = Seq((0L, 3L, 0L, "a,b"), (1L, 2L, 0L, ""))
      .toDF("file_id", "n_rows", "n_nulls", "vals")
    val r1 = Layout.adviseColumnIndex(fits).head()
    assert(r1.getString(2) === "value_set" && r1.getLong(1) === 0L)
    val over = Seq((0L, 3L, 0L, "a,b"), (1L, 9L, 0L, null: String))
      .toDF("file_id", "n_rows", "n_nulls", "vals")
    val r2 = Layout.adviseColumnIndex(over).head()
    assert(r2.getString(2) === "bloom" && r2.getLong(1) === 1L)
  }

  test("adviseMaintenance: overlap outranks sizing; empty manifest is none") {
    import spark.implicits._
    def man(rows: (Long, Long, Long, Long)*) =
      rows.toSeq.toDF("file_id", "n_rows", "min_key", "max_key")
    // overlapping envelopes with PERFECT sizes: still a rewrite — a
    // rebalance cannot fix depth, and merging across the overlap
    // would make it worse
    val overlap = Layout.adviseMaintenance(
      man((0L, 500L, 0L, 99L), (1L, 500L, 50L, 149L)), targetRows = 400L)
      .head()
    assert(overlap.getAs[String]("decision") === "rewrite")
    assert(overlap.getAs[Long]("max_depth") === 2L)
    // disjoint but one small file: rebalance
    val small = Layout.adviseMaintenance(
      man((0L, 500L, 0L, 99L), (1L, 100L, 100L, 199L)), targetRows = 400L)
      .head()
    assert(small.getAs[String]("decision") === "rebalance")
    // disjoint, well-sized: none
    val ok = Layout.adviseMaintenance(
      man((0L, 500L, 0L, 99L), (1L, 400L, 100L, 199L)), targetRows = 400L)
      .head()
    assert(ok.getAs[String]("decision") === "none")
    // empty manifest: zero files, depth 0, none — no NULL leaks
    val empty = Layout.adviseMaintenance(
      man().limit(0), targetRows = 400L).head()
    assert(empty.getAs[Long]("n_files") === 0L)
    assert(empty.getAs[Long]("max_depth") === 0L)
    assert(empty.getAs[Long]("n_small") === 0L)
    assert(empty.getAs[String]("decision") === "none")
  }
}
