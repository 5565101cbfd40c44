package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The MOR deletion-vector read-amplification trade, MEASURED — the
  * round-12 verdict's ask: compactDv's threshold decides how much of
  * the deleted mass is materialized away (write cost now) vs paid as
  * the readWithDv anti-join on every read (read cost forever). This
  * probe sweeps the threshold over a clustered table whose per-file
  * deleted fraction VARIES (0–49%, pseudo-random by file), timing for
  * each threshold:
  *
  *   - compact wall  — materializing the hot files (rows rewritten
  *     under fresh ids, their DV entries dropped);
  *   - read wall     — readWithDv over the compacted (rows', dv'),
  *     measured against PERSISTED inputs so the wall is the anti-join
  *     itself, not the fixture;
  *   - dv_after      — surviving tombstones (the read's right side);
  *   - rows_rewritten — the materialization's write amplification.
  *
  * Sentinels: threshold 0.0 (materialize everything = eager COW
  * delete; read cost reverts to a plain scan) and 1.1 (pure MOR —
  * zero write, full anti-join on every read). The interesting regime
  * is between: the threshold that stops paying read amplification on
  * files that are mostly tombstones anyway.
  *
  * Usage: runMain graft.ProbeMorDv [nRows] [nFiles]
  */
object ProbeMorDv {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).flatMap(_.toLongOption).getOrElse(20000000L)
    val files = args.lift(1).flatMap(_.toIntOption).getOrElse(400)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Snapshot

    val rowsPerFile = math.max(1L, n / files)
    val rows = spark.range(n).select(
        (col("id") / rowsPerFile).cast("long").as("file_id"),
        col("id").as("key"),
        (col("id") % 997).cast("double").as("qty"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rows.count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // per-file deleted fraction: (file_id*7919 mod 50)% of rows
    val del = rows.filter(pmod(col("key"), lit(100L)) <
      pmod(col("file_id") * 7919L, lit(50L))).select("key")
    val (dv, tDelete) = time {
      val d = Snapshot.deleteMor(rows, del).persist(StorageLevel.MEMORY_AND_DISK)
      d.count(); d
    }
    val dvN = dv.count()
    val (_, tRead0) = time(noop(Snapshot.readWithDv(rows, dv)))
    val (_, tScan) = time(noop(rows))
    System.err.println(f"[mor] n=$n files=$files dv_entries=$dvN " +
      f"deleteMor_wall=$tDelete%.2f s plain_scan=$tScan%.2f s " +
      f"read_uncompacted=$tRead0%.2f s")

    for (t <- Seq(0.0, 0.1, 0.2, 0.3, 0.45, 1.1)) {
      val ((rows2, dv2, nHot, nRewritten), tCompact) = time {
        val (r2, d2, audit) = Snapshot.compactDv(rows, dv, t)
        val r2p = r2.persist(StorageLevel.MEMORY_AND_DISK)
        val d2p = d2.persist(StorageLevel.MEMORY_AND_DISK)
        val nr = r2p.count(); d2p.count()
        val hot = audit.filter(col("materialized"))
          .agg(count(lit(1)), coalesce(sum(col("n_rows") - col("n_deleted")), lit(0L)))
          .head()
        (r2p, d2p, hot.getLong(0), hot.getLong(1))
      }
      val dvAfter = dv2.count()
      val (_, tRead) = time(noop(Snapshot.readWithDv(rows2, dv2)))
      // second (warm) read: the steady-state wall a reader actually
      // pays — the first includes the union frame's first-touch costs
      val (_, tRead2) = time(noop(Snapshot.readWithDv(rows2, dv2)))
      System.err.println(f"[mor] threshold=$t%.2f files_hot=$nHot " +
        f"rows_rewritten=$nRewritten dv_after=$dvAfter " +
        f"compact_wall=$tCompact%.2f s read_wall=$tRead%.2f s " +
        f"read_warm=$tRead2%.2f s")
      rows2.unpersist(); dv2.unpersist()
    }
    spark.stop()
  }
}
