package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom runtime filter — the "small side prunes the big
  * scan before the shuffle" pattern that Spark's own runtime row-level
  * filtering applies under AQE, surfaced as an explicit operator so a
  * pipeline can gate a 100 TB probe side on a selective dimension
  * BEFORE the shuffle join (rows that fail the filter never enter the
  * exchange). Unlike the builtin `BloomFilterAggregate` (random-seeded,
  * opaque sketch bytes), this filter is pure hash60 arithmetic on an
  * explicit (word, bits) bitset frame — deterministic, mergeable (the
  * bitset build is a `bit_or` groupBy), and exactly replayable by any
  * SQL engine, so false-positive behavior is oracle-checkable, not just
  * asserted.
  *
  * Shapes: the bitset is `m/32` rows (a few thousand for m = 2^16..2^20)
  * — always broadcast. Probing is `k` broadcast equi-joins + codegen'd
  * bitwise tests: no shuffle, no explode, no per-row aggregation on the
  * probe side.
  */
object Bloom {

  private def pos(key: Column, j: Int, m: Int, salt: String): Column =
    Dedup.saltedPos(key, j, m, salt)

  /** Build the bitset frame (word_idx, bits) from the build side's
    * keys: k hash positions per key, OR-folded into 32-bit words (32,
    * not 64, so `1 << (p % 32)` never touches a BIGINT sign bit — the
    * arithmetic stays portable to engines that reject signed-overflow
    * shifts). */
  def buildBits(keys: DataFrame, key: Column, m: Int, k: Int,
      salt: String): DataFrame = {
    require(m % 32 == 0 && k >= 1 && k <= 8)
    val perHash = (0 until k).map { j =>
      keys.select(pos(key, j, m, salt).as("p"))
    }.reduce(_ union _)
    perHash
      .select(expr("p div 32").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("bit"))
      .groupBy("word_idx").agg(expr("bit_or(bit)").as("bits"))
  }

  /** Add a `bloom_pass` flag: true iff all k positions of `key` are set
    * in `bits`. k broadcast left joins against the m/32-row bitset —
    * the probe side stays shuffle-free and fully codegen'd.
    *
    * `bloom_pass` is a RESERVED output name; the k working columns are
    * salt-namespaced (`__bf<h>_{p,w,b}<j>`) so a probe frame carrying
    * generic `__p0`-style names cannot collide. A probe that already
    * carries any reserved name fails loudly here instead of producing
    * an ambiguous-column error (or a silent drop) downstream. */
  def mightContain(probe: DataFrame, key: Column, bits: DataFrame,
      m: Int, k: Int, salt: String): DataFrame = {
    val pfx = s"__bf${(salt.hashCode & Int.MaxValue) % 100000}_"
    val reserved = "bloom_pass" +:
      (0 until k).flatMap(j => Seq(s"${pfx}p$j", s"${pfx}w$j", s"${pfx}b$j"))
    val clash = probe.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"probe frame already carries reserved bloom column(s): ${clash.mkString(", ")}")
    var df = probe
    val hits = (0 until k).map { j =>
      val b = bits.select(col("word_idx").as(s"${pfx}w$j"), col("bits").as(s"${pfx}b$j"))
      df = df.withColumn(s"${pfx}p$j", pos(key, j, m, salt))
        .join(broadcast(b), expr(s"${pfx}p$j div 32") === col(s"${pfx}w$j"), "left")
      expr(s"coalesce((${pfx}b$j & shiftleft(CAST(1 AS BIGINT), CAST(${pfx}p$j % 32 AS INT))) != 0, false)")
    }
    df.withColumn("bloom_pass", hits.reduce(_ && _))
      .drop((0 until k).flatMap(j => Seq(s"${pfx}p$j", s"${pfx}w$j", s"${pfx}b$j")): _*)
  }

  /** Per-FILE Bloom index for the snapshot manifest: one (file_id,
    * word_idx, bits) bitset per data file, built in a single groupBy
    * over the write path's rows. Carried next to the min/max envelope,
    * it upgrades point-key operations from "scan the table to find the
    * touched files" to METADATA-ONLY discovery ([[candidateFiles]]) —
    * the same role Iceberg/Parquet bloom columns play. Size per file is
    * m/32 longs (m=4096 → 128 words ≈ 1 KB); the index is
    * files × m/32 rows — metadata-scale, never row-scale. */
  def buildFileBits(rows: DataFrame, fileCol: Column, key: Column,
      m: Int, k: Int, salt: String): DataFrame = {
    require(m % 32 == 0 && k >= 1 && k <= 8)
    // ONE scan: the k positions explode from an inline array (a k-way
    // union re-reads the table k times)
    val perHash = rows.select(fileCol.as("file_id"),
      explode(array((0 until k).map(j => pos(key, j, m, salt)): _*)).as("p"))
    perHash
      .select(col("file_id"), expr("p div 32").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("bit"))
      .groupBy("file_id", "word_idx").agg(expr("bit_or(bit)").as("bits"))
  }

  /** Incrementally maintain the per-file bloom index across a COW
    * merge: `carried` files keep their bitsets VERBATIM (their data
    * did not change — the bits cannot either), and only the
    * rewritten/added files rebuild, from THEIR rows alone. The index
    * inherits mergeCow's cost model — O(touched files), never
    * O(table) — and stays bit-identical to a full rebuild (the q206
    * gate). `newManifest` is mergeCow's action-tagged manifest;
    * `newRows` its post-merge rows. */
  def maintainFileBits(prevBits: DataFrame, newManifest: DataFrame,
      newRows: DataFrame, key: Column, m: Int, k: Int, salt: String): DataFrame = {
    val carriedIds = newManifest.filter(col("action") === "carried")
      .select("file_id")
    val freshIds = newManifest.filter(col("action") =!= "carried")
      .select("file_id")
    val kept = prevBits.join(broadcast(carriedIds), Seq("file_id"), "left_semi")
    val fresh = buildFileBits(
      newRows.join(broadcast(freshIds), Seq("file_id"), "left_semi"),
      col("file_id"), key, m, k, salt)
    kept.unionByName(fresh)
  }

  /** Metadata-only touch-set discovery: which files MIGHT contain any
    * of `keys`? A file qualifies iff for some probe key all k of its
    * positions are set in that file's bitset. No false negatives (the
    * exact touch set is always a subset — the gate [[q202]] checks),
    * false positives are bounded by the (m, k, keys-per-file) choice
    * and only cost a wasted file read downstream.
    *
    * Shape: |keys|·k probe rows join the files × m/32 index on
    * word_idx — metadata joined to metadata; the table's rows are
    * never touched. Returns distinct (file_id). */
  def candidateFiles(keys: DataFrame, key: Column, fileBits: DataFrame,
      m: Int, k: Int, salt: String): DataFrame =
    candidateKeyFiles(keys, key, fileBits, m, k, salt)
      .select("file_id").distinct()

  /** [[candidateFiles]] at (key, file_id) granularity: every pair
    * where the file's bitset passes all k probes for the key — the
    * "might contain" relation itself, before the per-file collapse.
    * No false negatives per pair; a key with NO pair is DEFINITELY
    * absent from the table (what makes metadata-only insert lower
    * bounds possible in [[Snapshot.adviseMergeFromManifest]]).
    * Returns (key, file_id) with `key` in its original type. */
  def candidateKeyFiles(keys: DataFrame, key: Column, fileBits: DataFrame,
      m: Int, k: Int, salt: String): DataFrame = {
    val probes = (0 until k).map { j =>
      keys.select(key.as("key"), lit(j).as("_j"),
        pos(key, j, m, salt).as("_p"))
    }.reduce(_ union _)
    probes
      .join(fileBits, expr("_p div 32") === col("word_idx"))
      .filter(expr("(bits & shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))) != 0"))
      .groupBy(col("key"), col("file_id"))
      .agg(countDistinct(col("_j")).as("_hits"))
      .filter(col("_hits") === k)
      .select("key", "file_id")
  }
}
