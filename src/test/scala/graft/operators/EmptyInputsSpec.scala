package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the round-8 operator family: every
  * operator must return an empty (or well-defined) frame on empty
  * input, never throw — the property that keeps a 1000-step pipeline
  * alive when one upstream partition filter matches nothing. */
class EmptyInputsSpec extends SparkSpec {
  import spark.implicits._

  private val noRows = Seq.empty[(Long, Long)].toDF("u", "v")

  test("graph operators accept empty edge lists") {
    assert(Centrality.pageRank(noRows.toDF("src", "dst"), 2).count() === 0L)
    assert(Centrality.triangleCounts(noRows).count() === 0L)
    val kc = Centrality.kCorePeel(noRows, k = 2, rounds = 2)
    assert(kc.count() === 0L)
  }

  test("layout operators accept empty inputs") {
    val df = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(Layout.zoneMap(df, expr("id div 10"), Seq("k" -> col("k"))).count() === 0L)
    assert(Layout.compactionPlan(
      Seq.empty[(String, Long, Long)].toDF("source", "frag_idx", "bytes"),
      1000L).count() === 0L)
    assert(Layout.zorderReport(df, col("id"), col("k"), 4, 4).count() === 0L)
  }

  test("bloom with an empty build side rejects every probe") {
    val bits = Bloom.buildBits(Seq.empty[Tuple1[Long]].toDF("key"),
      col("key"), 1024, 3, "e")
    val probed = Bloom.mightContain((1L to 50L).toDF("key"), col("key"),
      bits, 1024, 3, "e")
    assert(probed.where(col("bloom_pass")).count() === 0L)
    assert(probed.count() === 50L)
  }

  test("sketches and eval accept empty inputs") {
    val df = Seq.empty[(String, Long)].toDF("g", "h")
    assert(df.groupBy("g").agg(graft.functions.Sketches.kmvDistinct(col("h"), 8))
      .count() === 0L)
    assert(Frequency.countMin(df, col("h"), 64, 3, "e").count() === 0L)
    assert(Quantiles.histQuantiles(
      Seq.empty[(String, Double)].toDF("g", "v"), col("g"), col("v"),
      16, Seq(0.5)).count() === 0L)
    assert(Eval.rocPoints(Seq.empty[(Double, Boolean)].toDF("s", "y"),
      col("s"), col("y")).count() === 0L)
    // binaryEval on empty input: one row of zero counts, null metrics
    val be = Eval.binaryEval(Seq.empty[(Double, Boolean)].toDF("s", "y"),
      col("s"), col("y")).head()
    assert(be.getAs[Any]("n_pos") == null || be.getAs[Long]("n_pos") == 0L)
  }

  test("tokenizers and similarity joins accept empty corpora") {
    val units = Seq.empty[(Long, String)].toDF("doc_id", "c")
    val vocab = Unigram.trainVocab(units, col("c"))
    assert(vocab.count() === 0L)
    assert(Unigram.segmentReport(units, col("doc_id"), col("c"), vocab)
      .count() === 0L)
    assert(Dedup.prefixJaccardJoin(
      Seq.empty[(Long, String)].toDF("doc", "tok"), 3, 5).count() === 0L)
    assert(Blocking.editDistanceJoin(
      Seq.empty[(Long, String)].toDF("id", "n"), col("id"), col("n"))
      .count() === 0L)
  }

  test("snapshot manifest arithmetic accepts empty frames") {
    val noManifest = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("version", "file_id", "n_rows", "min_key", "max_key")
    val noData = Seq.empty[(Long, Long)].toDF("id", "k")
    assert(Snapshot.manifestEntries(noData, col("id"), col("k"), 4, 1L)
      .count() === 0L)
    // append onto an empty table: added ids start at 0
    val added = Snapshot.manifestEntries(
      (0L until 10L).map(i => (i, i)).toDF("id", "k"), col("id"), col("k"), 2, 1L)
    val m = Snapshot.commitAppend(noManifest, added, 1L).collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum === 10L)
    assert(m.map(_.getAs[Long]("file_id")).min === 0L)
    // compacting an empty manifest is an empty manifest
    assert(Snapshot.commitCompact(noManifest, 10L, 100L, 2L).count() === 0L)
    val d = Snapshot.snapshotDiff(noManifest, noManifest).collect().head
    assert(d.getAs[Long]("files_added") === 0L &&
      d.getAs[Long]("rows_removed") === 0L)
  }
}
