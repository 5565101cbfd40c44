package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import java.nio.file.Files

/** Pins the transformWithState TIMER semantics q259's counter does not
  * touch (InactivityTimeoutProcessor): event-time timers re-registered
  * per input batch, fired when the watermark passes them, exactly once
  * per registration — including timers registered BEFORE a checkpoint
  * restart and fired after it. The timer-vs-watermark batch ordering
  * (timers fire only once the watermark has advanced past them, which
  * happens in a later trigger than the data that moved it) is
  * engine-internal, so these assertions are the documentation. */
class TransformStateSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000L // ms
  private val Min = 60000L

  test("inactivity timers fire once per key when the watermark passes, across a restart") {
    val base = Files.createTempDirectory("graft-tws").toString
    val landing = s"$base/landing"; val out = s"$base/out"
    new java.io.File(landing).mkdirs()

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val provWas = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runPass(): Unit = {
        val st = spark.readStream
          .schema("user_id LONG, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "10000").parquet(landing)
          .withWatermark("ts", "0 seconds")
        val outDs = st
          .select(col("user_id"), unix_millis(col("ts")).as("ms"))
          .as[(Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new InactivityTimeoutProcessor(30 * Min),
            TimeMode.EventTime(), OutputMode.Append())
        val q = outDs.toDF().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", s"$base/ck")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def drop(rows: (Long, Long)*): Unit =
        rows.toSeq.toDF("user_id", "ms")
          .select(col("user_id"), timestamp_millis(col("ms")).as("ts"))
          .write.mode("append").parquet(landing)

      // drop 1: user 1 active twice (timer re-registered), user 2 once
      drop((1L, T0), (1L, T0 + 10 * Min), (2L, T0))
      runPass()
      // drop 2 (after restart): a sentinel key pushes the watermark far
      // past both users' timers; its own timer stays in the future
      drop((3L, T0 + 300 * Min))
      runPass()
      // a third pass with no new data lets the engine run the no-data
      // batch that fires timers against the drop-2 watermark, if it
      // did not already fire them inside pass 2
      runPass()

      val rows = spark.read.parquet(out).as[(Long, Long)].collect().toSeq.sorted
      // user 1's d1-era FIRST timer (T0+30min) was deleted by the
      // re-registration at T0+40min; exactly one timeout each for
      // users 1 and 2, none for the sentinel
      assert(rows === Seq(
        (1L, T0 + 10 * Min + 30 * Min),
        (2L, T0 + 30 * Min)), s"got $rows")
    } finally {
      provWas match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
