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

  test("CAS commit: N genuinely concurrent threads, one winner per version") {
    // real thread-level concurrency (round-10 brief): 6 uncoordinated
    // writers hammer commitCas until 20 versions exist. The claim
    // marker is POSIX O_CREAT|O_EXCL on local fs (claimVersion's
    // LocalFileSystem branch), so exactly one thread can win each
    // version no matter how the threads interleave — the invariant
    // this test would break loudly if the claim were exists-then-create.
    val root = java.nio.file.Files.createTempDirectory("snapcasmt").toString
    val target = 19L // highest version to reach (20 commits, v0..v19)
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 6).map { tid =>
      new Thread(() => {
        try {
          var done = false
          while (!done) {
            val expected =
              if (!new java.io.File(s"$root/_CURRENT").exists()) -1L
              else Snapshot.currentVersion(spark, root).drop(1).toLong
            if (expected >= target) done = true
            else {
              val d = Seq((tid, expected + 1)).toDF("writer", "attempt_for")
              try {
                val v = Snapshot.commitCas(spark, root, expected, d,
                  Snapshot.manifestEntries(d, col("writer"), col("writer"),
                    1, expected + 1))
                wins.add((tid, v))
              } catch { case _: Snapshot.CommitConflictException => () }
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(failures.isEmpty, s"writer thread died: ${failures.peek()}")
    assert(Snapshot.currentVersion(spark, root) === s"v$target")
    // exactly one winner per version, every version won exactly once
    val byVersion = wins.toArray(Array.empty[(Int, Long)]).groupBy(_._2)
    assert(byVersion.keySet === (0L to target).toSet)
    assert(byVersion.values.forall(_.length == 1))
    // the work is spread: with 6 threads racing 20 rounds, no single
    // thread monopolizes (a monopoly would mean the others never get a
    // consistent read — i.e. mutual exclusion degenerated to lockout)
    assert(wins.toArray(Array.empty[(Int, Long)]).map(_._1).distinct.length > 1)
    // every version's data says exactly the writer who won it, and its
    // claim marker exists (winners never release; markers expire via
    // vacuum with their version)
    (0L to target).foreach { v =>
      val rows = spark.read.parquet(s"$root/data/v$v").collect()
      assert(rows.length === 1)
      assert(rows(0).getAs[Int]("writer") === byVersion(v)(0)._1)
      assert(new java.io.File(s"$root/claim/v$v").exists())
    }
    // a claimed-then-crashed writer blocks only its number until
    // released; after releaseClaim there is no orphan marker
    assert(Snapshot.claimVersion(spark, root, target + 1))
    Snapshot.releaseClaim(spark, root, target + 1)
    assert(!new java.io.File(s"$root/claim/v${target + 1}").exists())
  }

  test("as-of timestamp resolution: time travel, ties, vacuum expiry") {
    val root = java.nio.file.Files.createTempDirectory("snapasof").toString
    var expected = -1L
    for ((n, ts) <- Seq((10L, 1000L), (20L, 2000L), (30L, 3000L))) {
      val d = (0L until n).map(i => (i, s"r$i")).toDF("id", "v")
      expected = Snapshot.commitCas(spark, root, expected, d,
        Snapshot.manifestEntries(d, col("id"), col("id"), 2, expected + 1),
        commitMillis = ts)
    }
    // before the first commit: the table did not exist
    intercept[IllegalArgumentException] {
      Snapshot.resolveVersionAsOf(spark, root, 999L)
    }
    // exact stamp resolves to that version; between stamps, the floor
    assert(Snapshot.resolveVersionAsOf(spark, root, 1000L) === 0L)
    assert(Snapshot.resolveVersionAsOf(spark, root, 1999L) === 0L)
    assert(Snapshot.resolveVersionAsOf(spark, root, 2000L) === 1L)
    assert(Snapshot.resolveVersionAsOf(spark, root, Long.MaxValue) === 2L)
    assert(Snapshot.readAsOf(spark, root, 2500L).count() === 20L)
    // readCurrent and the as-of-now read agree
    assert(Snapshot.readAsOf(spark, root, 3000L).count() ===
      Snapshot.readCurrent(spark, root).count())
    // vacuumed snapshots stop resolving — their meta expires with them
    assert(Snapshot.vacuum(spark, root, retain = 1) === Seq(0L, 1L))
    intercept[IllegalArgumentException] {
      Snapshot.resolveVersionAsOf(spark, root, 2500L)
    }
    assert(Snapshot.resolveVersionAsOf(spark, root, 3000L) === 2L)
    assert(!new java.io.File(s"$root/claim/v0").exists())
    assert(!new java.io.File(s"$root/meta/v1").exists())
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

  test("vacuumPlan pins versions named by live branch refs") {
    val root = java.nio.file.Files.createTempDirectory("snapvacbr").toString
    def d(v: Long) = (0L until 10L).map(i => (i, s"v$v-$i")).toDF("id", "v")
    Snapshot.commit(spark, root, 1L, d(1),
      Snapshot.manifestEntries(d(1), col("id"), col("id"), 2, 1L))
    Snapshot.createBranch(spark, root, "stage") // head=1, base=1
    for (v <- 2L to 5L)
      Snapshot.commit(spark, root, v, d(v),
        Snapshot.manifestEntries(d(v), col("id"), col("id"), 2, v))
    // retain=2 would name 1,2,3 — but v1 is the branch's head AND base
    assert(Snapshot.vacuumPlan(spark, root, retain = 2) === Seq(2L, 3L))
    // branch advances: its head (v6) and fork base (v1) both stay pinned
    Snapshot.commitToBranch(spark, root, "stage", d(6),
      Snapshot.manifestEntries(d(6), col("id"), col("id"), 2, 6L))
    assert(Snapshot.vacuumPlan(spark, root, retain = 1) === Seq(2L, 3L, 4L))
    // vacuum executes the pinned plan; the branch stays readable
    Snapshot.vacuum(spark, root, retain = 1)
    assert(Snapshot.readBranch(spark, root, "stage").count() === 10L)
    assert(spark.read.parquet(s"$root/data/v1").count() === 10L)
  }

  test("adviseMergeFromManifest: metadata-only estimates bound the " +
      "exact advisor on every term") {
    import graft.operators.Bloom
    // 40 keys in 4 files of 10; batch: update keys 0-4 (file 0),
    // delete 10-11 (file 1), insert 100-102 (absent)
    val target = (0L until 40L).map(kk => (kk / 10L, kk, kk * 1.0))
      .toDF("file_id", "key", "qty")
    val m1 = Snapshot.manifestEntriesBy(target, col("file_id"), col("key"), 1L)
    val source = ((0L until 5L).map(kk => (kk, "U")) ++
      Seq((10L, "D"), (11L, "D")) ++
      (100L until 103L).map(kk => (kk, "U"))).toDF("key", "op")
    val fb = Bloom.buildFileBits(target, col("file_id"), col("key"),
      4096, 3, "mbf")
    val est = Snapshot.adviseMergeFromManifest(source, fb, m1, 4096, 3, "mbf")
      .collect()(0)
    val exact = Snapshot.adviseMerge(target, source, m1).collect()(0)
    def l(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    // one-sided bounds from bloom soundness (no false negatives)
    assert(l(est, "est_files_touched") >= l(exact, "files_touched"))
    assert(l(est, "est_touched_rows") >= l(exact, "touched_rows"))
    assert(l(est, "est_matched_keys_max") >= l(exact, "matched_keys"))
    assert(l(est, "definite_inserts") <= l(exact, "inserts"))
    assert(l(est, "est_cow_write_rows_max") >= l(exact, "cow_write_rows"))
    assert(l(est, "est_mor_write_rows_max") >= l(exact, "mor_write_rows"))
    // with m=4096 over 40 keys the false-positive mass is ~zero: the
    // estimates should EQUAL the exact terms here, not just bound them
    assert(l(est, "est_files_touched") === l(exact, "files_touched"))
    assert(l(est, "est_matched_keys_max") === l(exact, "matched_keys"))
    assert(l(est, "definite_inserts") === l(exact, "inserts"))
    assert(est.getAs[String]("recommend_estimate") ===
      exact.getAs[String]("recommend"))
  }

  test("vacuumPlan: exact tmp-ref matching and crash-leftover tolerance") {
    val root = java.nio.file.Files.createTempDirectory("snapvactmp").toString
    def d(v: Long) = (0L until 10L).map(i => (i, s"v$v-$i")).toDF("id", "v")
    Snapshot.commit(spark, root, 1L, d(1),
      Snapshot.manifestEntries(d(1), col("id"), col("id"), 2, 1L))
    // a branch whose NAME merely contains ".tmp" must still be pinned —
    // the old substring filter silently never pinned it
    Snapshot.createBranch(spark, root, "rel.tmpdir")
    for (v <- 2L to 5L)
      Snapshot.commit(spark, root, v, d(v),
        Snapshot.manifestEntries(d(v), col("id"), col("id"), 2, v))
    // a crash-leftover swap temp (<name>.tmp<digits>, possibly with
    // garbage content) is skipped by PATTERN, not read as a ref
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/refs/rel.tmpdir.tmp7"),
      "not a ref".getBytes("UTF-8"))
    assert(Snapshot.vacuumPlan(spark, root, retain = 2) === Seq(2L, 3L))
    // a branch name matching the crash-leftover pattern is refused at
    // creation — vacuum could never pin it
    intercept[IllegalArgumentException] {
      Snapshot.createBranch(spark, root, "bad.tmp3")
    }
    // a malformed REAL ref still fails the plan loudly: silently
    // unpinning a corrupted branch would hand its head to the vacuum
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/refs/corrupt"),
      "garbage".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      Snapshot.vacuumPlan(spark, root, retain = 2)
    }
  }

  test("sibling publish race: one winner, loser conflicts, rebases, " +
      "publishes; vacuum under fire destroys nothing") {
    val root = java.nio.file.Files.createTempDirectory("snappubrace").toString
    def mani(df: org.apache.spark.sql.DataFrame) =
      Snapshot.manifestEntries(df, col("id"), col("id"), 2, 0L)
    val base = (0L until 20L).map(i => (i, 0L)).toDF("id", "x")
    Snapshot.commit(spark, root, 1L, base, mani(base), commitMillis = 1000L)
    // two sibling branches forked from v1 with DISJOINT edits
    Snapshot.createBranch(spark, root, "b1")
    Snapshot.createBranch(spark, root, "b2")
    val s1 = base.withColumn("x",
      when(col("id") % 2 === 0, lit(100L)).otherwise(col("x")))
    val s2 = base.withColumn("x",
      when(col("id") % 2 === 1, lit(200L)).otherwise(col("x")))
    Snapshot.commitToBranch(spark, root, "b1", s1, mani(s1), 2000L)
    Snapshot.commitToBranch(spark, root, "b2", s2, mani(s2), 2000L)
    // race the two publishes on real threads, with a vacuum hammering
    // concurrently — the pin rule (branch heads AND fork bases) must
    // hold while refs appear, move, and retire under it
    val outcomes = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stopVac = new java.util.concurrent.atomic.AtomicBoolean(false)
    val vac = new Thread(() => {
      try while (!stopVac.get()) Snapshot.vacuum(spark, root, retain = 1)
      catch { case t: Throwable => failures.add(t) }
    })
    val racers = Seq("b1", "b2").map(b => new Thread(() => {
      try { Snapshot.publishBranch(spark, root, b); outcomes.put(b, "won") }
      catch {
        case _: Snapshot.CommitConflictException => outcomes.put(b, "conflict")
        case t: Throwable => failures.add(t); outcomes.put(b, "died")
      }
    }))
    vac.start(); racers.foreach(_.start()); racers.foreach(_.join(300000))
    stopVac.set(true); vac.join(300000)
    assert(failures.isEmpty, s"race thread died: ${failures.peek()}")
    // exactly one winner; the loser got the loud retryable conflict
    assert(outcomes.values().toArray.map(_.toString).toSeq.sorted ===
      Seq("conflict", "won"))
    val loser = Seq("b1", "b2").find(outcomes.get(_) == "conflict").get
    val winner = Seq("b1", "b2").find(outcomes.get(_) == "won").get
    // vacuum under fire never destroyed the loser's staged state
    assert(Snapshot.readBranch(spark, root, loser).count() === 20L)
    // loser retries per the conflict contract: rebase onto main, publish
    Snapshot.rebaseBranch(spark, root, loser, "id", "x", mani, 3000L)
    Snapshot.publishBranch(spark, root, loser)
    // final state carries BOTH disjoint edits — nothing was dropped
    val fin = Snapshot.readCurrent(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach { i =>
      assert(fin(i) === (if (i % 2 == 0) 100L else 200L),
        s"id $i lost an edit (winner=$winner loser=$loser)")
    }
  }

  test("publish claim lease: live claim holds, stale claim is taken over, " +
      "takeover arbiter admits exactly one of many contenders") {
    val root = java.nio.file.Files.createTempDirectory("snaplease").toString
    def mani(df: org.apache.spark.sql.DataFrame) =
      Snapshot.manifestEntries(df, col("id"), col("id"), 2, 0L)
    val base = (0L until 8L).map(i => (i, 0L)).toDF("id", "x")
    Snapshot.commit(spark, root, 1L, base, mani(base), commitMillis = 1000L)
    Snapshot.createBranch(spark, root, "b1")
    val s1 = base.withColumn("x", lit(7L))
    Snapshot.commitToBranch(spark, root, "b1", s1, mani(s1), 2000L)
    // a publisher died mid-window: its claim marker is on disk
    val claim = new java.io.File(s"$root/claim/pub-v1")
    claim.getParentFile.mkdirs()
    assert(claim.createNewFile())
    // FRESH claim = a live publisher: the contender conflicts and the
    // marker survives (a lease must never evict a live writer)
    intercept[Snapshot.CommitConflictException] {
      Snapshot.publishBranch(spark, root, "b1")
    }
    assert(claim.exists())
    // aged past the lease: takeover wins and the publish completes
    assert(claim.setLastModified(
      System.currentTimeMillis() - Snapshot.PublishLeaseMillis - 60000L))
    assert(Snapshot.publishBranch(spark, root, "b1") === 2L)
    assert(Snapshot.currentVersion(spark, root) === "v2")
    // the winner's own marker was released on exit; no tombstone lingers
    assert(!claim.exists())
    assert(!new java.io.File(s"$root/claim").list()
      .exists(_.startsWith(".stale-pub-v1")))

    // arbiter under real thread concurrency: one stale version claim,
    // many contenders — exactly one may win the takeover
    val vclaim = new java.io.File(s"$root/claim/v9")
    assert(vclaim.createNewFile())
    assert(vclaim.setLastModified(System.currentTimeMillis() - 100000L))
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = (1 to 8).map(_ => new Thread(() =>
      try {
        if (Snapshot.claimVersionWithLease(spark, root, 9L,
            leaseMillis = 1000L)) wins.incrementAndGet()
      } catch { case t: Throwable => failures.add(t) }))
    ts.foreach(_.start()); ts.foreach(_.join(300000))
    assert(failures.isEmpty, s"contender died: ${failures.peek()}")
    assert(wins.get() === 1)
    // the winner's fresh claim is now live: a late contender loses
    assert(!Snapshot.claimVersionWithLease(spark, root, 9L,
      leaseMillis = 60000L))
  }

  test("lease takeover TOCTOU: a rival completing its whole takeover in " +
      "the stat-to-rename gap is detected by the tombstone-mtime check; " +
      "the moved-aside fresh claim is restored and the late mover loses") {
    val root = java.nio.file.Files.createTempDirectory("snapleasegap").toString
    val claim = new java.io.File(s"$root/claim/v11")
    claim.getParentFile.mkdirs()
    assert(claim.createNewFile())
    val staleMtime = System.currentTimeMillis() - 100000L
    assert(claim.setLastModified(staleMtime))
    // the round-15 advisory's interleaving: B stats the stale marker,
    // then A runs rename→verify→delete→re-create to completion, THEN
    // B's rename fires — without the tombstone-mtime verification B
    // would move A's FRESH claim to the tombstone, delete it, re-claim,
    // and both contenders would return true
    var rivalWon = false
    Snapshot.beforeTakeoverRename = () => {
      Snapshot.beforeTakeoverRename = () => () // the rival runs unhooked
      rivalWon = Snapshot.claimVersionWithLease(spark, root, 11L,
        leaseMillis = 1000L)
    }
    try {
      val lateWin = Snapshot.claimVersionWithLease(spark, root, 11L,
        leaseMillis = 1000L)
      assert(rivalWon, "rival takeover of the genuinely stale claim")
      assert(!lateWin, "the late mover must detect the fresh tombstone")
      assert(claim.exists(), "the rival's live claim must be restored")
      // the restored claim is fresh: yet another contender still loses
      assert(!Snapshot.claimVersionWithLease(spark, root, 11L,
        leaseMillis = 60000L))
      // nothing left moved-aside: the restore reclaimed the tombstone
      assert(!new java.io.File(s"$root/claim").list()
        .exists(_.startsWith(".stale-v11")))
    } finally Snapshot.beforeTakeoverRename = () => ()
  }

  test("threeWayMerge classifies every divergence arm and merges branch reads") {
    val root = java.nio.file.Files.createTempDirectory("snap3way").toString
    val base = (1L to 10L).map(k => (k, k * 100L)).toDF("k", "v")
    Snapshot.commit(spark, root, 1L, base,
      Snapshot.manifestEntries(base, col("k"), col("k"), 2, 1L))
    Snapshot.createBranch(spark, root, "ours")
    Snapshot.createBranch(spark, root, "theirs")
    // ours: update k=1 (+10), update k=4 (+40), delete k=2, insert 100
    val ours = base.filter(col("k") =!= 2L)
      .select(col("k"), when(col("k") === 1L, col("v") + 10)
        .when(col("k") === 4L, col("v") + 40).otherwise(col("v")).as("v"))
      .unionByName(Seq((100L, 7L)).toDF("k", "v"))
    // theirs: update k=1 (+20) [conflict], delete k=2 [agrees],
    // update k=3 (+30) [theirs-only], insert 101
    val theirs = base.filter(col("k") =!= 2L)
      .select(col("k"), when(col("k") === 1L, col("v") + 20)
        .when(col("k") === 3L, col("v") + 30).otherwise(col("v")).as("v"))
      .unionByName(Seq((101L, 9L)).toDF("k", "v"))
    Snapshot.commitToBranch(spark, root, "ours", ours,
      Snapshot.manifestEntries(ours, col("k"), col("k"), 2, 2L))
    Snapshot.commitToBranch(spark, root, "theirs", theirs,
      Snapshot.manifestEntries(theirs, col("k"), col("k"), 2, 3L))
    val merged = Snapshot.threeWayMerge(Snapshot.readCurrent(spark, root),
      Snapshot.readBranch(spark, root, "ours"),
      Snapshot.readBranch(spark, root, "theirs"), "k", "v")
    val byK = merged.collect().map(r => r.getAs[Long]("k") ->
      (r.getAs[String]("action"), r.getAs[Boolean]("present"),
        Option(r.getAs[java.lang.Long]("v")).map(_.toLong))).toMap
    assert(byK(1L) === ("conflict", false, None))
    assert(byK(2L) === ("both", false, None)) // both deleted — agree
    assert(byK(3L) === ("theirs", true, Some(330L)))
    assert(byK(4L) === ("ours", true, Some(440L)))
    assert(byK(5L) === ("base", true, Some(500L)))
    assert(byK(100L) === ("ours", true, Some(7L)))
    assert(byK(101L) === ("theirs", true, Some(9L)))
    assert(byK.size === 12) // 10 base keys + 2 one-sided inserts
    // row conservation: every key of any side classified exactly once
    assert(merged.groupBy("k").count().filter(col("count") > 1).count() === 0L)
  }

  test("rebaseBranch: conflicted publish -> rebase -> fast-forward publish") {
    val root = java.nio.file.Files.createTempDirectory("snaprebase").toString
    def mani(df: org.apache.spark.sql.DataFrame) =
      Snapshot.manifestEntries(df, col("k"), col("k"), 2, 0L)
    val base = (1L to 10L).map(k => (k, k * 100L)).toDF("k", "v")
    Snapshot.commit(spark, root, 1L, base, mani(base))
    Snapshot.createBranch(spark, root, "stage")
    // branch edits k=1; main advances editing the DISJOINT k=9
    val staged = base.select(col("k"),
      when(col("k") === 1L, lit(111L)).otherwise(col("v")).as("v"))
    Snapshot.commitToBranch(spark, root, "stage", staged, mani(staged))
    val main2 = base.select(col("k"),
      when(col("k") === 9L, lit(999L)).otherwise(col("v")).as("v"))
    Snapshot.commit(spark, root, 3L, main2, mani(main2))
    // stale publish conflicts (main moved past the fork base)
    intercept[Snapshot.CommitConflictException] {
      Snapshot.publishBranch(spark, root, "stage")
    }
    // rebase merges both edit sets; publish then fast-forwards
    Snapshot.rebaseBranch(spark, root, "stage", "k", "v", mani)
    val published = Snapshot.publishBranch(spark, root, "stage")
    val state = Snapshot.readCurrent(spark, root).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(state(1L) === 111L && state(9L) === 999L && state(5L) === 500L)
    assert(state.size === 10)
    assert(Snapshot.currentVersion(spark, root) === s"v$published")
    // a CONFLICTING branch (same key, different value) refuses to rebase
    Snapshot.createBranch(spark, root, "clash")
    val clash = Snapshot.readCurrent(spark, root).select(col("k"),
      when(col("k") === 2L, lit(21L)).otherwise(col("v")).as("v"))
    Snapshot.commitToBranch(spark, root, "clash", clash, mani(clash))
    val main3 = Snapshot.readCurrent(spark, root).select(col("k"),
      when(col("k") === 2L, lit(22L)).otherwise(col("v")).as("v"))
    Snapshot.commit(spark, root, published + 2, main3, mani(main3))
    intercept[Snapshot.CommitConflictException] {
      Snapshot.rebaseBranch(spark, root, "clash", "k", "v", mani)
    }
  }

  // --- mergeCow: keys 0..99 in 4 files of 25; ops touch files 1 and 2
  private def mergeFixture() = {
    val target = (0L until 100L).map(i => (i / 25L, i, i * 10.0))
      .toDF("file_id", "key", "qty")
    val source = Seq(
      (30L, "U", 999.0),  // update in file 1
      (55L, "D", 0.0),    // delete in file 2
      (200L, "U", 42.0),  // insert (no existing file)
      (201L, "U", 43.0)   // insert
    ).toDF("key", "op", "qty")
    val m1 = Snapshot.manifestEntriesBy(target, col("file_id"), col("key"), 1L)
    (target, source, m1)
  }

  test("mergeCow rewrites only touched files, carries the rest id-stable") {
    val (target, source, m1) = mergeFixture()
    val (m2, rows2, changes) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 2)
    val man = m2.collect()
    // untouched files 0 and 3 carried with original ids; 1 and 2
    // rewritten under fresh monotone ids past the previous max (3)
    assert(man.filter(_.getAs[String]("action") == "carried")
      .map(_.getAs[Long]("file_id")).sorted.toSeq === Seq(0L, 3L))
    val rewritten = man.filter(_.getAs[String]("action") == "rewritten")
    assert(rewritten.map(_.getAs[Long]("file_id")).sorted.toSeq === Seq(4L, 5L))
    // the deleted key's file lost one row; the updated file kept 25
    assert(rewritten.map(_.getAs[Long]("n_rows")).sorted.toSeq === Seq(24L, 25L))
    val added = man.filter(_.getAs[String]("action") == "added")
    assert(added.forall(_.getAs[Long]("file_id") >= 6L))
    assert(added.map(_.getAs[Long]("n_rows")).sum === 2L)
    // row conservation: 100 - 1 delete + 2 inserts
    assert(rows2.count() === 101L)
    // manifest row counts agree with the actual rows per file
    val perFile = rows2.groupBy("file_id").count().collect()
      .map(r => r.getAs[Long]("file_id") -> r.getAs[Long]("count")).toMap
    assert(man.forall(r => perFile(r.getAs[Long]("file_id")) === r.getAs[Long]("n_rows")))
    // the updated value landed; the deleted key is gone
    val byKey = rows2.collect().map(r => r.getAs[Long]("key") -> r.getAs[Double]("qty")).toMap
    assert(byKey(30L) === 999.0)
    assert(!byKey.contains(55L))
    assert(byKey(200L) === 42.0)
    assert(changes.count() === 4L)
  }

  test("mergeCow writer-side change feed agrees with the reader-side version diff") {
    val (target, source, m1) = mergeFixture()
    val (_, rows2, changes) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 2)
    val readerDiff = target.select(col("key"), col("qty").as("_qa"))
      .join(rows2.select(col("key"), col("qty").as("_qb")), Seq("key"), "full_outer")
      .filter(col("_qa").isNull || col("_qb").isNull || !(col("_qa") <=> col("_qb")))
      .select(col("key"),
        when(col("_qa").isNull, lit("insert"))
          .when(col("_qb").isNull, lit("delete"))
          .otherwise(lit("update")).as("change_type"),
        col("_qa").as("value_before"), col("_qb").as("value_after"))
    val w = changes.collect().map(_.toSeq).toSet
    val r = readerDiff.collect().map(_.toSeq).toSet
    assert(w === r)
  }

  test("Ivm: incremental maintenance off the change feed equals full recompute") {
    val (target, source, m1) = mergeFixture()
    val (_, rows2, changes) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 2)
    val grp = expr("key div 32")
    val v1 = Ivm.buildSumCount(target, grp, "qty")
    val inc = Ivm.applySumCountDelta(v1, changes, expr("key div 32"))
    val full = Ivm.buildSumCount(rows2, grp, "qty")
    assert(inc.collect().map(_.toSeq).toSet === full.collect().map(_.toSeq).toSet)
    // empty feed → identity
    val empty = Seq.empty[(Long, String, Option[Double], Option[Double])]
      .toDF("key", "change_type", "value_before", "value_after")
    assert(Ivm.applySumCountDelta(v1, empty, expr("key div 32"))
      .collect().map(_.toSeq).toSet === v1.collect().map(_.toSeq).toSet)
    // deleting every row of a group removes the group from the view;
    // inserting into an unseen group creates it
    val feed = (0L until 32L)
      .map(k => (k, "delete", Option(k * 10.0), Option.empty[Double]))
      .toDF("key", "change_type", "value_before", "value_after")
      .unionByName(Seq((9000L, "insert", Option.empty[Double], Option(5.0)))
        .toDF("key", "change_type", "value_before", "value_after"))
    val v2 = Ivm.applySumCountDelta(v1, feed, expr("key div 32")).collect()
      .map(r => r.getAs[Long]("group") ->
        (r.getAs[java.math.BigDecimal]("sum_val").doubleValue, r.getAs[Long]("n"))).toMap
    assert(!v2.contains(0L))
    assert(v2(281L) === ((5.0, 1L)))
  }

  test("Ivm join-view: dim reassignment + fact inserts equal a recompute; " +
      "groups empty and appear") {
    // facts: key→dim fk, value; dims: fk→attr
    val f0 = Seq((1L, 10L, 2.5), (2L, 10L, 1.5), (3L, 11L, 4.0), (4L, 12L, 8.0))
      .toDF("fk_ign", "fk", "v").select(col("fk"), col("v"))
    val dim0 = Seq((10L, 100L), (11L, 100L), (12L, 200L)).toDF("dk", "attr")
    // dim 11 moves 100→300 (new group); dim 12 moves 200→100 (200 empties)
    val changes = Seq((11L, 100L, 300L), (12L, 200L, 100L))
      .toDF("key", "attr_old", "attr_new")
    val dimNew = Seq((10L, 100L), (11L, 300L), (12L, 100L)).toDF("dk", "attr")
    val fd = Seq((11L, 1.0), (13L, 6.0)).toDF("fk", "v") // 13 unmatched → dropped
    val v0 = Ivm.buildSumCount(f0.join(dim0, col("fk") === col("dk")),
      col("attr"), "v")
    val inc = Ivm.applyJoinViewDelta(v0, fd, col("fk"), "v",
      dimNew, col("dk"), col("attr"), changes, f0, col("fk"), "v")
    val full = Ivm.buildSumCount(
      f0.unionByName(fd).join(dimNew, col("fk") === col("dk")),
      col("attr"), "v")
    assert(inc.collect().map(_.toSeq).toSet === full.collect().map(_.toSeq).toSet)
    val m = inc.collect().map(r => r.getAs[Long]("group") ->
      (r.getAs[java.math.BigDecimal]("sum_val").doubleValue,
        r.getAs[Long]("n"))).toMap
    assert(m(100L) === ((12.0, 3L))) // 2.5+1.5 stay; 8.0 moves in
    assert(m(300L) === ((5.0, 2L))) // 4.0 moves in; insert 1.0 lands on new dim
    assert(!m.contains(200L)) // emptied by the reassignment
  }

  test("Ivm minmax: growth absorbs free, extremum removal dirties, duplicates survive") {
    def feed(rows: (Long, String, Option[Double], Option[Double])*) =
      rows.toSeq.toDF("key", "change_type", "value_before", "value_after")
    // group = key div 10; group 0 holds {1.0, 5.0, 5.0}; group 1 holds {7.0}
    val rows0 = Seq((0L, 1.0), (1L, 5.0), (2L, 5.0), (10L, 7.0)).toDF("key", "qty")
    val v1 = Ivm.buildMinMax(rows0, expr("key div 10"), "qty")
    def view(changes: org.apache.spark.sql.DataFrame,
        current: org.apache.spark.sql.DataFrame) =
      Ivm.applyMinMaxDelta(v1, changes, expr("key div 10"),
        current, expr("key div 10"), "qty").collect()
        .map(r => r.getAs[Long]("group") ->
          (r.getAs[Double]("min_val"), r.getAs[Double]("max_val"),
            r.getAs[Long]("n"), r.getAs[Boolean]("recomputed"))).toMap
    // growth only: insert 9.0 into group 0 — absorbed, no recompute
    val cur1 = rows0.unionByName(Seq((3L, 9.0)).toDF("key", "qty"))
    val g = view(feed((3L, "insert", None, Some(9.0))), cur1)
    assert(g(0L) === ((1.0, 9.0, 4L, false)) && g(1L) === ((7.0, 7.0, 1L, false)))
    // delete the min of group 0 — dirty, targeted recompute
    val cur2 = rows0.filter(col("key") =!= 0L)
    val r = view(feed((0L, "delete", Some(1.0), None)), cur2)
    assert(r(0L) === ((5.0, 5.0, 2L, true)) && r(1L) === ((7.0, 7.0, 1L, false)))
    // delete ONE copy of the duplicated max — conservative dirty, value survives
    val cur3 = rows0.filter(col("key") =!= 1L)
    val dup = view(feed((1L, "delete", Some(5.0), None)), cur3)
    assert(dup(0L) === ((1.0, 5.0, 2L, true)))
    // non-extremal update stays clean; unseen group recomputes
    val cur4 = rows0.unionByName(Seq((25L, 2.0)).toDF("key", "qty"))
    val nu = view(feed((25L, "insert", None, Some(2.0))), cur4)
    assert(nu(2L) === ((2.0, 2.0, 1L, true)) && nu(0L)._4 === false)
  }

  test("readEvolved: rename + typed-NULL backfill + widening, no data rewrite") {
    val oldF = Seq((1, 10), (2, 20)).toDF("key", "qty")           // key INT, qty INT
    val newF = Seq((3L, 30.5, 0.1)).toDF("key", "quantity", "disc") // evolved
    val out = Snapshot.readEvolved(oldF, newF,
      renames = Map("qty" -> "quantity"), added = Seq(("disc", "double")))
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("key", "bigint"), ("quantity", "double"), ("disc", "double")))
    val rows = out.collect().map(r => (r.getLong(0),
      r.getDouble(1), Option(r.get(2)))).sortBy(_._1)
    assert(rows === Seq((1L, 10.0, None), (2L, 20.0, None), (3L, 30.5, Some(0.1))))
    // an added column that already exists in the old schema is a bug
    intercept[IllegalArgumentException] {
      Snapshot.readEvolved(oldF, newF, added = Seq(("qty", "double")))
    }
  }

  test("deleteRange: contained files drop metadata-only, boundary files rewrite") {
    val (target, _, m1) = mergeFixture() // keys 0..99, 4 files of 25
    // [25, 74] exactly covers files 1 and 2 → both drop, nothing rewrites
    val (a1, r1) = Snapshot.deleteRange(target, m1, "qty", 25L, 74L, 2L)
    val c1 = a1.collect().map(r =>
      r.getAs[Long]("file_id") -> r.getAs[String]("action")).toMap
    assert(c1 === Map(0L -> "carried", 1L -> "dropped", 2L -> "dropped", 3L -> "carried"))
    assert(r1.count() === 50L)
    // [30, 60] straddles both → no drops, files 1 and 2 rewrite under
    // fresh ids with only their surviving rows
    val (a2, r2) = Snapshot.deleteRange(target, m1, "qty", 30L, 60L, 2L)
    val acts = a2.collect()
    assert(acts.count(_.getAs[String]("action") == "dropped") === 0)
    val rw = acts.filter(_.getAs[String]("action") == "rewritten")
    assert(rw.map(_.getAs[Long]("file_id")).sorted.toSeq === Seq(4L, 5L))
    assert(rw.map(_.getAs[Long]("n_rows")).sum === (5 + 14)) // 25..29 and 61..74
    assert(r2.count() === 100L - 31L)
    // no key inside the range survives anywhere
    assert(r2.filter(col("key").between(30L, 60L)).count() === 0L)
  }

  test("optimistic concurrent merges: CAS loser rebases; disjoint merges commute") {
    // Delta-style optimistic concurrency composed from the existing
    // primitives: two writers prepare merges against the same snapshot,
    // one wins the CAS, the loser gets a LOUD conflict and REBASES —
    // recomputes its merge against the winner's output and commits the
    // next version. Disjoint key sets must serialize to the same table
    // either way.
    val root = java.nio.file.Files.createTempDirectory("graft_cas_merge").toString
    val (target, _, m1) = mergeFixture()
    Snapshot.commitCas(spark, root, expected = -1L, target,
      m1.withColumn("version", lit(0L)))

    def mergeAgainstCurrent(source: org.apache.spark.sql.DataFrame, expected: Long): Long = {
      val cur = Snapshot.readCurrent(spark, root)
      val ver = expected + 1
      val man = spark.read.parquet(
        s"$root/manifest/v${Snapshot.currentVersion(spark, root).drop(1)}")
      val (m2, rows2, _) = Snapshot.mergeCow(cur, source, man, "qty", ver, 2)
      Snapshot.commitCas(spark, root, expected, rows2, m2)
    }

    val srcA = Seq((10L, "U", 111.0), (11L, "U", 222.0)).toDF("key", "op", "qty")
    val srcB = Seq((90L, "D", 0.0), (200L, "U", 42.0)).toDF("key", "op", "qty")

    // B prepares its merge against v0 BEFORE A commits...
    val v0rows = Snapshot.readCurrent(spark, root)
    val v0man = spark.read.parquet(s"$root/manifest/v0")
    val (bStaleMan, bStaleRows, _) =
      Snapshot.mergeCow(v0rows, srcB, v0man, "qty", 1L, 2)
    // ...A wins at v1; B's stale commit must fail LOUDLY pre-data
    assert(mergeAgainstCurrent(srcA, 0L) === 1L)
    intercept[Snapshot.CommitConflictException] {
      Snapshot.commitCas(spark, root, expected = 0L, bStaleRows, bStaleMan)
    }
    // nothing half-published by the loser
    assert(Snapshot.currentVersion(spark, root) === "v1")
    // B rebases against v1 and lands v2
    assert(mergeAgainstCurrent(srcB, 1L) === 2L)

    val got = Snapshot.readCurrent(spark, root).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Double]("qty")).toMap
    // serial A-then-B state: both writers' effects present
    assert(got(10L) === 111.0 && got(11L) === 222.0)
    assert(!got.contains(90L) && got(200L) === 42.0)
    assert(got.size === 100) // 100 - 1 delete + 1 insert; updates in place
    // commutativity check: B-then-A on a second table yields the same rows
    val root2 = java.nio.file.Files.createTempDirectory("graft_cas_merge2").toString
    Snapshot.commitCas(spark, root2, expected = -1L, target,
      m1.withColumn("version", lit(0L)))
    def mergeIn(root: String, source: org.apache.spark.sql.DataFrame, expected: Long): Long = {
      val cur = Snapshot.readCurrent(spark, root)
      val man = spark.read.parquet(
        s"$root/manifest/v${Snapshot.currentVersion(spark, root).drop(1)}")
      val (m2, rows2, _) = Snapshot.mergeCow(cur, source, man, "qty", expected + 1, 2)
      Snapshot.commitCas(spark, root, expected, rows2, m2)
    }
    mergeIn(root2, srcB, 0L); mergeIn(root2, srcA, 1L)
    val got2 = Snapshot.readCurrent(spark, root2).collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Double]("qty")).toMap
    assert(got2 === got)
  }

  test("mergeCow with an empty source carries everything and changes nothing") {
    val (target, _, m1) = mergeFixture()
    val empty = Seq.empty[(Long, String, Double)].toDF("key", "op", "qty")
    val (m2, rows2, changes) = Snapshot.mergeCow(target, empty, m1, "qty", 2L, 2)
    assert(m2.collect().forall(_.getAs[String]("action") == "carried"))
    assert(rows2.count() === 100L)
    assert(changes.count() === 0L)
    // a no-op update (same value) is suppressed from the change feed
    val noop = Seq((30L, "U", 300.0)).toDF("key", "op", "qty")
    val (_, _, c2) = Snapshot.mergeCow(target, noop, m1, "qty", 2L, 2)
    assert(c2.count() === 0L)
  }

  test("MOR deletion vectors: no-op on misses, idempotent, compaction extremes") {
    val (target, _, _) = mergeFixture()
    // deleting keys that don't exist tombstones nothing
    val misses = Seq(900L, 901L).toDF("key")
    assert(Snapshot.deleteMor(target, misses).count() === 0L)
    // deleting the same keys twice yields the same DV (set semantics)
    val keys = Seq(30L, 55L, 56L).toDF("key")
    val dv1 = Snapshot.deleteMor(target, keys)
    val dv2 = Snapshot.deleteMor(target, keys.unionByName(keys))
    assert(dv1.exceptAll(dv2).isEmpty && dv2.exceptAll(dv1).isEmpty)
    assert(Snapshot.readWithDv(target, dv1).count() === 97L)
    // threshold 0: EVERY file materializes, DV fully drained, read stable
    val (r0, d0, a0) = Snapshot.compactDv(target, dv1, threshold = 0.0)
    assert(d0.count() === 0L)
    assert(a0.filter(!col("materialized")).count() === 0L)
    assert(Snapshot.readWithDv(r0, d0).count() === 97L)
    // threshold > 1: nothing materializes, DV intact, read stable
    val (r1, d1, a1) = Snapshot.compactDv(target, dv1, threshold = 1.1)
    assert(d1.count() === dv1.count())
    assert(a1.filter(col("materialized")).count() === 0L)
    assert(Snapshot.readWithDv(r1, d1).count() === 97L)
  }

  test("compactFiles never drops rows whose file_id the manifest misses") {
    // manifest/rows drift (file 99 exists in rows but not in the
    // manifest) must NOT silently lose data: the unknown row carries
    // through untouched and the output manifest re-covers it
    val rows = Seq((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c"),
      (99L, 500L, "x")).toDF("file_id", "key", "v")
    val manifest = Seq((1L, 0L, 2L, 1L, 2L), (1L, 1L, 1L, 3L, 3L))
      .toDF("version", "file_id", "n_rows", "min_key", "max_key")
    val (m2, r2) = Snapshot.compactFiles(rows, manifest, col("key"),
      smallRows = 2L, targetRows = 4L, version = 2L)
    assert(r2.count() === rows.count())
    assert(r2.filter(col("key") === 500L).select("file_id")
      .as[Long].collect().toSeq === Seq(99L))
    // every surviving row's file is a manifest entry (drift healed)
    assert(r2.join(m2.select("file_id"), Seq("file_id"), "left_anti").count() === 0L)
    // and the consistent part still compacts: small file 1 repacked
    assert(m2.filter(col("file_id") === 1L).count() === 0L)
  }

  test("fresh-id rank windows are PARTITIONED (two-phase prefix sum, plan lock)") {
    // the mutation family's fresh-file-id ranks must never plan as an
    // unpartitioned row_number over the touch/boundary/hot frame — a
    // degenerate input (every file touched) would single-partition it;
    // freshRanks' row_number is partitioned by _p (mod 64), with only
    // the <=64-row offsets frame globally ordered
    val (target, source, m1) = mergeFixture()
    val (_, cowRows, _) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 2)
    val (_, delRows) = Snapshot.deleteRange(target, m1, "qty", 30L, 60L, 2L)
    val dv = Snapshot.deleteMor(target, Seq(30L, 55L).toDF("key"))
    val (cRows, _, _) = Snapshot.compactDv(target, dv, 0.0)
    for (df <- Seq(cowRows, delRows, cRows)) {
      val plan = df.queryExecution.executedPlan.toString
      val rn = plan.linesIterator.filter(_.contains("row_number()")).toSeq
      assert(rn.nonEmpty, plan.take(1000))
      rn.foreach(l =>
        assert(l.contains("windowspecdefinition(_p#"), s"unpartitioned rank: $l"))
    }
  }

  test("WAP branch: staged commits are invisible on main; publish is a " +
      "fast-forward; a stale sibling conflicts; ref retired") {
    val root = java.nio.file.Files.createTempDirectory("snapwap").toString
    val d1 = (0L until 100L).map(i => (i, s"a$i")).toDF("id", "v")
    Snapshot.commit(spark, root, 1L, d1,
      Snapshot.manifestEntries(d1, col("id"), col("id"), 4, 1L),
      commitMillis = 1000L)
    assert(Snapshot.createBranch(spark, root, "wap") === 1L)
    assert(Snapshot.createBranch(spark, root, "stale") === 1L)
    val staged = (0L until 160L).map(i => (i, s"s$i")).toDF("id", "v")
    val v2 = Snapshot.commitToBranch(spark, root, "wap", staged,
      Snapshot.manifestEntries(staged, col("id"), col("id"), 4, 2L),
      commitMillis = 2000L)
    assert(v2 === 2L)
    // write isolation: main still resolves v1, branch sees the staged state
    assert(Snapshot.currentVersion(spark, root) === "v1")
    assert(Snapshot.readCurrent(spark, root).count() === 100L)
    assert(Snapshot.readBranch(spark, root, "wap").count() === 160L)
    // audit approves → publish = one pointer fast-forward
    assert(Snapshot.publishBranch(spark, root, "wap") === 2L)
    assert(Snapshot.currentVersion(spark, root) === "v2")
    assert(Snapshot.readCurrent(spark, root).count() === 160L)
    // the published ref is retired
    intercept[Exception] { Snapshot.branchRef(spark, root, "wap") }
    // the sibling forked from v1; main moved past it → rebase rule fires
    intercept[Snapshot.CommitConflictException] {
      Snapshot.publishBranch(spark, root, "stale")
    }
    assert(Snapshot.currentVersion(spark, root) === "v2")
    // branch commits never reuse version numbers a main commit claimed:
    // a third branch minted AFTER v2 skips to v3
    Snapshot.createBranch(spark, root, "next")
    val v3 = Snapshot.commitToBranch(spark, root, "next", d1,
      Snapshot.manifestEntries(d1, col("id"), col("id"), 4, 3L),
      commitMillis = 3000L)
    assert(v3 === 3L)
    // as-of time travel resolves branch-committed versions once published
    assert(Snapshot.publishBranch(spark, root, "next") === 3L)
    assert(Snapshot.resolveVersionAsOf(spark, root, 2500L) === 2L)
  }

  test("mergeMor read equals mergeCow result on the same batch") {
    val (target, source, m1) = mergeFixture()
    val (_, cowRows, _) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 2)
    val (dv, app) = Snapshot.mergeMor(target, source, "qty", insertFiles = 2)
    val morLive = Snapshot.readWithDv(
      target.select("file_id", "key", "qty").unionByName(app), dv)
    val a = cowRows.select("key", "qty")
    val b = morLive.select("key", "qty")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "MOR read must equal the COW merged state")
    // write-side accounting: tombstones only for EXISTING matched rows
    assert(dv.count() === 2L) // keys 30 (U) and 55 (D); 200/201 are inserts
    assert(app.count() === 3L) // updates 30 + inserts 200, 201
  }
}
