package graft.streaming

import graft.model.Statement
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over statement drops — the streaming analog of
  * the reference's scheduled batch runs (SURVEY §2.8): the reference
  * re-crawls on a cron cadence (datasets/_collections/default.yml:5)
  * and relies on run-version snapshots for increments (T4/T5); a
  * streaming deployment instead watches a landing directory of
  * statement files and maintains the same invariants continuously:
  *
  *  - statement-id dedupe (P6) becomes `dropDuplicatesWithinWatermark`
  *    with a watermark bounding the dedup state — the streaming form of
  *    first-row-wins (tools/util.py:39-62);
  *  - crawl stats (A9) become a windowed aggregation per dataset;
  *  - entity upserts feed `foreachBatch`, where each micro-batch runs
  *    the SAME batch operators (assemble, delta) — no second code path.
  */
object StatementStream {

  /** File-source stream over a landing directory of statement parquet
    * drops. */
  def readStatements(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream
      .schema(Statement.sparkSchema)
      .parquet(landingDir)

  /** P6/T5 streaming: watermark + id-dedupe. `delay` bounds how late a
    * duplicate may arrive and still be suppressed — state is dropped
    * beyond it, keeping memory bounded on an unbounded stream.
    *
    * `dropDuplicatesWithinWatermark` is required for that bound: plain
    * `dropDuplicates("id")` only evicts state when the event-time column
    * is part of the dedup key, so keying on `id` alone would grow state
    * forever. The WithinWatermark variant keys on `id` and expires each
    * key once the watermark passes its event time. */
  def dedupedStatements(stream: DataFrame, delay: String = "1 hour"): DataFrame =
    stream
      .withWatermark("lastSeen", delay)
      .dropDuplicatesWithinWatermark("id")

  /** A9 streaming: per-dataset statement counts in tumbling windows. */
  def windowedCrawlStats(stream: DataFrame, windowLength: String = "1 hour"): DataFrame =
    stream
      .withWatermark("lastSeen", windowLength)
      .groupBy(window(col("lastSeen"), windowLength), col("dataset"))
      .agg(count(lit(1)).as("statements"),
        approx_count_distinct(col("entityId")).as("entities_approx"))
      .select(col("window.start").as("window_start"), col("dataset"),
        col("statements"), col("entities_approx"))

  /** J5 as streaming state: the TimeStampIndex
    * (zavod/zavod/runtime/timestamps.py:26-65) kept continuously — for
    * every statement id, the earliest firstSeen ever observed.
    * `mapGroupsWithState` holds one timestamp per id; incoming
    * statements fold their timestamps into it, and each update emits
    * the current (id, first_seen) for downstream upserts. */
  def firstSeenIndex(stream: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col("id"), col("firstSeen"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, java.sql.Timestamp)](
        GroupStateTimeout.NoTimeout()) {
        case (id, rows, state: GroupState[Long]) =>
          val minNew = rows.map(_._2.getTime).min
          val first = state.getOption.fold(minNew)(math.min(_, minNew))
          state.update(first)
          (id, new java.sql.Timestamp(first))
      }
      .toDF("id", "first_seen")
  }

  /** T4/J6 as streaming state: full-version delta per micro-batch
    * (zavod/zavod/runtime/delta.py:17-106 semantics, incrementally).
    * Each micro-batch is one landed VERSION SNAPSHOT of statements; the
    * batch reduces to per-entity order-insensitive hashes
    * (Delta.entityHash), diffs against the previous version's persisted
    * hash table, appends (version, id, op ∈ ADD/MOD/DEL) to `opsDir`,
    * and persists its own hash table as the next version's baseline —
    * so ADD/MOD/DEL streams out of every drop without ever re-reading
    * prior drops' statements.
    *
    * Scale shape: carried state is ONE (id, hash) row per live entity —
    * two orders of magnitude smaller than the statement store — and the
    * diff is an id-equi-join between consecutive hash tables; written
    * bucketed-by-id, consecutive versions co-partition and the join
    * plans with no extra Exchange (the q109 bucketed-delta path). The
    * hash table lives in plain parquet, not operator state, so a
    * checkpoint restart re-reads it for free; tables older than the
    * previous version are deleted once their successor's diff is
    * written, so storage stays two tables deep.
    *
    * Delivery contract: foreachBatch is at-least-once, so every write
    * here is per-version OVERWRITE — a retried batch id reproduces
    * identical output instead of duplicating it (read the ops back
    * with `opsDir/v*`). Each micro-batch MUST be one complete version
    * snapshot (q143 forces that with maxFilesPerTrigger ≥ drop size) —
    * a drop split across batches would diff a partial corpus and emit
    * spurious DELs. A missing previous hash table for bid > 0 is an
    * error, not an empty baseline: falling back silently would re-emit
    * the whole corpus as ADDs. */
  def versionDeltaBatch(batch: DataFrame, bid: Long,
      hashRoot: String, opsDir: String): Unit = {
    import graft.operators.Delta
    val spark = batch.sparkSession
    val curr = batch
      .groupBy(col("canonicalId").as("id"), col("schema"))
      .agg(collect_list(concat_ws("=", col("prop"), col("value"))).as("pairs"))
      .select(col("id"),
        Delta.entityHash(col("id"), col("schema"), col("pairs")).as("hash"))
    val currDir = s"$hashRoot/v$bid"
    curr.write.mode("overwrite").parquet(currDir)
    val currR = spark.read.parquet(currDir).select("id", "hash")
    val prevDir = new org.apache.hadoop.fs.Path(s"$hashRoot/v${bid - 1}")
    val fs = prevDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev =
      if (bid > 0) {
        if (!fs.exists(prevDir))
          throw new IllegalStateException(
            s"versionDeltaBatch: missing previous hash table $prevDir for batch $bid — " +
              "refusing to diff against an empty baseline (would emit every entity as ADD)")
        spark.read.parquet(prevDir.toString).select("id", "hash")
      } else currR.limit(0)
    Delta.diff(prev, currR)
      .withColumn("version", lit(bid))
      .select("version", "id", "op")
      .write.mode("overwrite").parquet(s"$opsDir/v$bid")
    // retention: only v{bid} (next round's baseline) and v{bid-1}
    // (retried-batch safety) are ever read again
    fs.delete(new org.apache.hadoop.fs.Path(s"$hashRoot/v${bid - 2}"), true)
  }

  /** Commit each micro-batch as an ATOMIC SNAPSHOT VERSION of the
    * store (batch id → v{bid}) — the streaming half of the
    * [[graft.operators.Snapshot]] protocol: data + manifest (zone-map
    * stats, hash file assignment) land under per-version directories,
    * then the CURRENT pointer swaps. Two delivery-contract choices
    * differ from the batch `Snapshot.commit`:
    *  - per-version directories are OVERWRITE, not ErrorIfExists —
    *    foreachBatch is at-least-once, and a retried batch id must
    *    reproduce its version instead of failing forever behind a
    *    partial first attempt (the versionDeltaBatch rule);
    *  - the pointer swap is FORWARD-ONLY
    *    ([[graft.operators.Snapshot.swapPointerForward]]), so a late
    *    retry of an old batch republishes its directory but can never
    *    roll the table back.
    * Readers that resolved an earlier version keep a consistent
    * snapshot — no commit ever mutates a prior version's files.
    * One race is inherent to overwrite-on-retry and accepted: a reader
    * that resolves version v at the exact moment a RETRY of batch v is
    * republishing that directory can observe the rewrite; readers of
    * every other version are untouched. The batch `Snapshot.commit`
    * (ErrorIfExists) has no such window — use it when the writer is
    * exactly-once. */
  def snapshotCommitBatch(batch: DataFrame, bid: Long, root: String,
      idCol: String, keyCol: String, files: Int = 16): Unit = {
    import graft.operators.Snapshot
    val spark = batch.sparkSession
    batch.write.mode("overwrite").parquet(s"$root/data/v$bid")
    // manifest from the PERSISTED data, not the live stream lineage:
    // re-reading what was written guarantees the manifest describes
    // exactly the committed bytes even if the batch frame is
    // re-evaluated non-identically
    val written = spark.read.parquet(s"$root/data/v$bid")
    Snapshot.manifestEntries(written, col(idCol), col(keyCol), files, bid)
      .write.mode("overwrite").parquet(s"$root/manifest/v$bid")
    Snapshot.swapPointerForward(spark, root, bid)
  }

  /** Run each micro-batch through an arbitrary batch transform (the
    * foreachBatch bridge): this is how assembled entities / deltas stay
    * ONE implementation for batch and streaming. Returns the started
    * query; caller stops it.
    *
    * Every batch emits one `[stream-batch]` stderr line with the
    * HANDLE wall (our per-batch work) and the GAP since the previous
    * handle returned (everything the streaming machinery did in
    * between: offset/commit checkpoint IO, source listing, trigger
    * scheduling). When a streaming query walls out on a loaded box,
    * these sub-timings say WHICH side wedged — a driver-box bench cap
    * with no such line was round 13's one unadjudicable artifact. */
  def foreachBatchSink(
      deduped: DataFrame,
      checkpointDir: String,
      outputMode: String = "append",
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)(
      handle: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val label = checkpointDir.replaceAll(".*/graft_", "").replaceAll("[^a-zA-Z0-9_].*", "")
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val w = deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val t0 = System.nanoTime()
        handle(batch.toDF(), id)
        val t1 = System.nanoTime()
        val gap = (t0 - lastEnd.getAndSet(t1)) / 1e9
        System.err.println(
          f"""[stream-batch] {"sink":"$label","batch":$id,"handle_sec":${(t1 - t0) / 1e9}%.3f,"machinery_gap_sec":$gap%.3f}""")
      }
    trigger.fold(w)(w.trigger).start()
  }
}
