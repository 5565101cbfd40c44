package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-commit protocol: manifest arithmetic invariants (row
  * conservation, id uniqueness across commits, diff symmetry) and the
  * FS-level guarantees the versioned store's publish depends on —
  * pointer-swap atomicity from the reader's side (a reader resolved
  * before a commit keeps a fully consistent old snapshot; one resolved
  * after sees exactly the new one) and vacuum never planning the
  * current or retained versions. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def mkManifest(rowsPerFile: Seq[Long], version: Long) =
    rowsPerFile.zipWithIndex.map { case (n, i) =>
      (version, i.toLong, n, i.toLong * 100, i.toLong * 100 + 99)
    }.toDF("version", "file_id", "n_rows", "min_key", "max_key")

  test("manifestEntries partitions every row exactly once with a true envelope") {
    val df = (0L until 1000L).map(i => (i, i * 3)).toDF("id", "k")
    val m = Snapshot.manifestEntries(df, col("id"), col("k"), files = 8, version = 1L)
    val rows = m.collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === 1000L)
    assert(rows.map(_.getAs[Long]("file_id")).distinct.length === rows.length)
    // envelopes cover the key domain
    assert(rows.map(_.getAs[Long]("min_key")).min === 0L)
    assert(rows.map(_.getAs[Long]("max_key")).max === 2997L)
  }

  test("commitAppend conserves rows and never reuses a file id") {
    val v1 = mkManifest(Seq(100L, 200L, 300L), 1L)
    val add = mkManifest(Seq(50L, 60L), 2L)
    val v2 = Snapshot.commitAppend(v1, add, 2L)
    val rows = v2.collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === 710L)
    assert(rows.map(_.getAs[Long]("file_id")).distinct.length === 5)
    // added ids start past the previous max (3, 4)
    assert(rows.map(_.getAs[Long]("file_id")).sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.forall(_.getAs[Long]("version") === 2L))
  }

  test("commitCompact merges small files, keeps big ones, conserves rows") {
    val v2 = mkManifest(Seq(1000L, 10L, 20L, 900L, 5L, 15L), 2L)
    val v3 = Snapshot.commitCompact(v2, smallRows = 100L, targetRows = 100L, version = 3L)
    val rows = v3.collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === 1950L)
    // the two big files carried over with their original ids
    val kept = rows.filter(_.getAs[Long]("n_rows") >= 100L)
    assert(kept.map(_.getAs[Long]("file_id")).sorted.toSeq === Seq(0L, 3L))
    // replacements got fresh ids past the old max of 5
    val packed = rows.filter(_.getAs[Long]("n_rows") < 100L)
    assert(packed.forall(_.getAs[Long]("file_id") >= 6L))
    // packed envelopes still cover the small files' key range
    assert(packed.map(_.getAs[Long]("min_key")).min === 100L)
    assert(packed.map(_.getAs[Long]("max_key")).max === 599L)
  }

  test("snapshotDiff reports adds/removes by file identity") {
    val a = mkManifest(Seq(100L, 200L, 300L), 1L)
    val b = Snapshot.commitCompact(a, smallRows = 150L, targetRows = 150L, version = 2L)
    val d = Snapshot.snapshotDiff(a, b).collect().head
    // file 0 (100 rows) was packed into a replacement; 1 and 2 carried
    assert(d.getAs[Long]("files_removed") === 1L)
    assert(d.getAs[Long]("files_added") === 1L)
    assert(d.getAs[Long]("rows_removed") === 100L)
    assert(d.getAs[Long]("rows_added") === 100L)
  }

  test("reader isolation: a resolved snapshot survives a concurrent commit") {
    val root = java.nio.file.Files.createTempDirectory("snap").toString
    val d1 = (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v")
    Snapshot.commit(spark, root, 1L, d1,
      Snapshot.manifestEntries(d1, col("id"), col("id"), 4, 1L))
    assert(Snapshot.currentVersion(spark, root) === "v1")
    // reader resolves v1 BEFORE the next commit
    val oldReader = Snapshot.readCurrent(spark, root)
    val d2 = (0L until 250L).map(i => (i, s"b$i")).toDF("id", "v")
    Snapshot.commit(spark, root, 2L, d2,
      Snapshot.manifestEntries(d2, col("id"), col("id"), 4, 2L))
    // the old reader still sees v1 in full — its files were never
    // touched by the v2 commit
    assert(oldReader.count() === 100L)
    assert(oldReader.where(col("v").startsWith("b")).count() === 0L)
    // a fresh resolve sees exactly v2
    assert(Snapshot.currentVersion(spark, root) === "v2")
    assert(Snapshot.readCurrent(spark, root).count() === 250L)
    // double-commit of an existing version fails loudly, current intact
    intercept[Exception] {
      Snapshot.commit(spark, root, 2L, d1,
        Snapshot.manifestEntries(d1, col("id"), col("id"), 4, 2L))
    }
    assert(Snapshot.currentVersion(spark, root) === "v2")
  }

  test("CAS commit: two interleaved committers, one wins, no corruption") {
    val root = java.nio.file.Files.createTempDirectory("snapcas").toString
    val d1 = (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v")
    val m1 = Snapshot.manifestEntries(d1, col("id"), col("id"), 4, 1L)
    // empty table: expected = -1, commits as v0
    assert(Snapshot.commitCas(spark, root, -1L, d1, m1) === 0L)
    assert(Snapshot.currentVersion(spark, root) === "v0")

    // both writers read CURRENT = v0 and prepare against it
    val expected = 0L
    val dA = (0L until 150L).map(i => (i, s"A$i")).toDF("id", "v")
    val dB = (0L until 200L).map(i => (i, s"B$i")).toDF("id", "v")
    // A commits first and wins v1
    assert(Snapshot.commitCas(spark, root, expected, dA,
      Snapshot.manifestEntries(dA, col("id"), col("id"), 4, 1L)) === 1L)
    // B's stale commit fails LOUDLY before touching any directory:
    // CURRENT moved past the version B prepared against
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitCas(spark, root, expected, dB,
        Snapshot.manifestEntries(dB, col("id"), col("id"), 4, 1L))
    }
    assert(Snapshot.currentVersion(spark, root) === "v1")
    assert(Snapshot.readCurrent(spark, root).count() === 150L)
    assert(!new java.io.File(s"$root/data/v2").exists())
    // B retries the protocol: re-read, re-prepare, commit — wins v2
    assert(Snapshot.commitCas(spark, root, 1L, dB,
      Snapshot.manifestEntries(dB, col("id"), col("id"), 4, 2L)) === 2L)
    assert(Snapshot.readCurrent(spark, root).count() === 200L)

    // interleave at the CLAIM level: a racer (or dead writer) already
    // holds v3's claim — commitCas fails loudly even though CURRENT
    // matches; releaseClaim is the admin escape, then commit succeeds
    assert(Snapshot.claimVersion(spark, root, 3L))
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitCas(spark, root, 2L, dA,
        Snapshot.manifestEntries(dA, col("id"), col("id"), 4, 3L))
    }
    assert(Snapshot.currentVersion(spark, root) === "v2")
    Snapshot.releaseClaim(spark, root, 3L)
    assert(Snapshot.commitCas(spark, root, 2L, dA,
      Snapshot.manifestEntries(dA, col("id"), col("id"), 4, 3L)) === 3L)
    // every published manifest intact — no lost update, no mixed files
    assert(spark.read.parquet(s"$root/manifest/v1")
      .agg(sum(col("n_rows"))).head.getLong(0) === 150L)
    assert(spark.read.parquet(s"$root/manifest/v2")
      .agg(sum(col("n_rows"))).head.getLong(0) === 200L)
    assert(spark.read.parquet(s"$root/manifest/v3")
      .agg(sum(col("n_rows"))).head.getLong(0) === 150L)
  }

  test("vacuumPlan never names the current or retained versions") {
    val root = java.nio.file.Files.createTempDirectory("snapvac").toString
    for (v <- 1L to 5L) {
      val d = (0L until 10L).map(i => (i, s"v$v-$i")).toDF("id", "v")
      Snapshot.commit(spark, root, v, d,
        Snapshot.manifestEntries(d, col("id"), col("id"), 2, v))
    }
    assert(Snapshot.vacuumPlan(spark, root, retain = 2) === Seq(1L, 2L, 3L))
    assert(Snapshot.vacuumPlan(spark, root, retain = 5) === Seq.empty)
    // executing the vacuum removes exactly those versions and leaves
    // the retained tail fully readable
    assert(Snapshot.vacuum(spark, root, retain = 2) === Seq(1L, 2L, 3L))
    val f = new java.io.File(s"$root/data")
    assert(f.listFiles().map(_.getName).sorted.toSeq === Seq("v4", "v5"))
    assert(Snapshot.readCurrent(spark, root).count() === 10L)
    assert(spark.read.parquet(s"$root/manifest/v4").count() > 0L)
    // idempotent: a second vacuum has nothing to delete
    assert(Snapshot.vacuum(spark, root, retain = 2) === Seq.empty)
  }
}
