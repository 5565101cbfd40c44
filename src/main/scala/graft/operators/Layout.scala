package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan efficiency — the file-level machinery
  * that makes a 100 TB table cheap to query: zone-map (min/max) skipping
  * indexes, Z-order multi-dimensional clustering, and small-file
  * compaction planning. The reference engine stores its statement log as
  * versioned parquet partitions (`zavod/zavod/archive/backend.py` — the
  * dataset/version directory layout) and leans on the object store's
  * listing for pruning; at the 100 TB scale this engine targets, layout
  * becomes a first-class operator family:
  *
  *  - a ZONE MAP is the per-file min/max sidecar every lakehouse format
  *    keeps (parquet row-group stats, Iceberg/Delta manifests). Built
  *    here as one groupBy over the file key — mergeable, incremental.
  *  - ZONE-MAP SKIPPING turns a range predicate into a candidate file
  *    list (tiny — one row per file) broadcast back against the scan:
  *    the engine-level analog of manifest pruning, with the residual
  *    predicate still pushed to the surviving files.
  *  - Z-ORDER assigns rows to files along a bit-interleaved curve over
  *    two dimensions, so every file covers a small rectangle and a
  *    rectangle query touches few files. The interleave is a static
  *    6+6-bit integer expression — fully codegen'd, no UDF.
  *  - COMPACTION packs an ordered fragment list into target-size output
  *    groups by start offset — the same two-phase prefix sum as
  *    sequence packing ([[Packing.twoPhaseRunning]]), applied to bytes:
  *    no global ordered window even over a 100M-file manifest.
  */
object Layout {

  /** Per-file zone map: (file_id, n_rows, min_<name>, max_<name> per
    * stat column). One partial-aggregated groupBy; output is one row per
    * file, safe to broadcast at any corpus scale where file count is
    * manifest-sized. */
  def zoneMap(df: DataFrame, fileId: Column, stats: Seq[(String, Column)]): DataFrame = {
    val aggs = stats.flatMap { case (n, c) =>
      Seq(min(c).as(s"min_$n"), max(c).as(s"max_$n"))
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(fileId.as("file_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate files for a closed range predicate `[lo, hi]` on stat
    * column `name`: files whose [min,max] envelope intersects the range.
    * `lo`/`hi` may be scalar subquery columns (data-derived bounds). */
  def candidateFiles(zm: DataFrame, name: String, lo: Column, hi: Column): DataFrame =
    zm.where(col(s"max_$name") >= lo && col(s"min_$name") <= hi)
      .select(col("file_id"))

  /** Zone-map-skipped scan: keep only rows of files in `candidates`,
    * then apply the residual predicate. The candidate list is one row
    * per surviving file — broadcast it so the scan side never shuffles;
    * on a partitioned table the same list drives partition pruning
    * instead (the join is the in-engine analog). */
  def skipScan(df: DataFrame, fileId: Column, candidates: DataFrame,
      residual: Column): DataFrame =
    df.withColumn("file_id", fileId)
      .join(broadcast(candidates), "file_id")
      .where(residual)

  /** Interleave the low `bits` bits of `x` (even positions) and `y`
    * (odd positions) into a Z-value. Static unrolled integer expression
    * — stays inside whole-stage codegen; disjoint bit positions mean
    * `+` is exact OR, keeping the arithmetic portable to any SQL
    * engine. */
  def zInterleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)).cast("long")
    }.reduce(_ + _)

  /** Z-order layout report: bucket both dimensions equi-width into
    * 2^bits cells (bounds derived from the data — one tiny aggregate,
    * broadcast back), interleave to a Z-value, assign `filesLog2`-bit
    * file ids from the TOP of the Z-value, and report each file's
    * covered rectangle. Small per-file spans ARE the clustering
    * guarantee: a rectangle query's candidate files come from the same
    * zone-map intersection as [[candidateFiles]].
    *
    * @return (file_id, n_rows, min_x, max_x, min_y, max_y,
    *          span_x, span_y) — x/y in the bucketed [0, 2^bits) domain */
  def zorderReport(df: DataFrame, xRaw: Column, yRaw: Column,
      bits: Int, filesLog2: Int): DataFrame = {
    require(2 * bits <= 62 && filesLog2 <= 2 * bits)
    // Input-domain contract: the bucket expression multiplies the
    // centered value by 2^bits BEFORE dividing, so a dimension whose
    // raw range exceeds Long.MaxValue >> bits (epoch-nanos, raw hashes)
    // would overflow BIGINT and silently scramble file assignment.
    // Bounds are data-derived, so the guard is evaluated in-plan on the
    // 1-row bounds aggregate: assert_true raises before any bucket is
    // computed. Pre-bucket such columns (e.g. v div 2^k) to narrow them.
    // The guard is folded into the lo bounds themselves (not a separate
    // droppable column, which Catalyst would prune away unevaluated):
    // any bucket computation forces the CASE, which raises on overflow.
    val lim = Long.MaxValue >> bits
    def guarded(lo: String, hi: String): Column =
      when(col(hi) - col(lo) < lim, col(lo))
        .otherwise(raise_error(lit(
          s"zorderReport: dimension range must be < $lim (Long.MaxValue >> bits=$bits); pre-bucket wide domains")).cast("long"))
    val bounds = df.agg(
        min(xRaw).as("_xlo_raw"), max(xRaw).as("_xhi"),
        min(yRaw).as("_ylo_raw"), max(yRaw).as("_yhi"))
      .select(guarded("_xlo_raw", "_xhi").as("_xlo"), col("_xhi"),
        guarded("_ylo_raw", "_yhi").as("_ylo"), col("_yhi"))
    val b = df.withColumn("_xv", xRaw).withColumn("_yv", yRaw)
      .crossJoin(broadcast(bounds))
    // integer equi-width bucket: (v - lo) * 2^bits div (hi - lo + 1)
    b.withColumn("_x",
        expr(s"((_xv - _xlo) * ${1L << bits}) div (_xhi - _xlo + 1)"))
      .withColumn("_y",
        expr(s"((_yv - _ylo) * ${1L << bits}) div (_yhi - _ylo + 1)"))
      .withColumn("_z", zInterleave(col("_x"), col("_y"), bits))
      .withColumn("file_id", shiftright(col("_z"), 2 * bits - filesLog2))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("_x")).as("min_x"), max(col("_x")).as("max_x"),
        min(col("_y")).as("min_y"), max(col("_y")).as("max_y"))
      .withColumn("span_x", col("max_x") - col("min_x"))
      .withColumn("span_y", col("max_y") - col("min_y"))
  }

  /** Clustered write: range-partition on the cluster keys and sort
    * within each partition before writing — the write-side layout that
    * makes the zone maps [[zoneMap]] reads maximally tight (each output
    * file covers a disjoint key range, so any range predicate prunes to
    * O(1) files). This is the standard lakehouse "sorted write"
    * (Iceberg's sort order / Delta's OPTIMIZE ZORDER for 1-D): one
    * range exchange + local sort, no global sort.
    *
    * File layout is engine-internal (range boundaries come from
    * sampling), so this is spec-verified by reading the files back and
    * asserting disjoint per-file envelopes — not oracle-gated. */
  def clusteredWrite(df: DataFrame, partitions: Int, path: String,
      clusterCols: Column*): Unit =
    df.repartitionByRange(partitions, clusterCols: _*)
      .sortWithinPartitions(clusterCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Compaction plan: pack the fragment list (one row per input file,
    * `bytes` each) into output groups of `targetBytes`, filling in
    * (`orderCol` ascending within `sourceCol`, sources ascending)
    * order. A fragment's group is its START offset div target — the
    * concat-and-chop rule, so the plan is a pure function of the
    * manifest. A fragment larger than the target is never split: it
    * joins the group its start offset lands in (together with whatever
    * smaller fragments started there), and the group ids its bytes
    * overflow past are simply skipped. Runs the shared two-phase prefix
    * sum: the only global window is over per-source totals.
    *
    * @param frags (source: string, frag_idx: long, bytes: long)
    * @return per-fragment plan + per-group rollup:
    *         (source, frag_idx, bytes, start_off, out_group,
    *          group_bytes, group_n_frags) */
  def compactionPlan(frags: DataFrame, targetBytes: Long): DataFrame = {
    val planned = Packing.twoPhaseRunning(frags, Seq.empty, "source",
        Seq("frag_idx"), "bytes")
      .withColumn("start_off", col("__bprefix") + col("__run") - col("bytes"))
      .withColumn("out_group", expr(s"start_off div CAST($targetBytes AS BIGINT)"))
      .select("source", "frag_idx", "bytes", "start_off", "out_group")
    val groups = planned.groupBy("out_group")
      .agg(sum("bytes").as("group_bytes"), count(lit(1)).as("group_n_frags"))
    planned.join(broadcast(groups), "out_group")
      .select("source", "frag_idx", "bytes", "start_off", "out_group",
        "group_bytes", "group_n_frags")
  }

  /** Incremental OPTIMIZE: restore the clustered-table invariant
    * (disjoint per-file key envelopes, [[clusteredWrite]]) after
    * unclustered appends, touching ONLY what the appends disturbed.
    * A clustered file is rewritten iff its envelope overlaps some
    * unclustered file's envelope; everything else is carried verbatim
    * — the full-table OPTIMIZE a naive maintenance job runs is the
    * degenerate case where appends span every range. The rewrite set
    * (overlapped clustered + all unclustered rows) is re-packed in key
    * order into `targetRows`-row files via the shared two-phase prefix
    * sum (bucket = floor(key / `bucketWidth`) in exact long arithmetic
    * — (k − pmod(k, w)) div w, so negative keys keep bucket order equal
    * to key order; plain `div` truncates toward zero and would fold
    * keys −w+1..w−1 into one bucket). The rank equals a global
    * ROW_NUMBER ordered by key without ever single-partitioning the
    * rewrite set.
    *
    * Scale shape: overlap detection is manifest×append-manifest zone
    * arithmetic — no data read decides anything; only rewrite-set ROWS
    * shuffle, proportional to what the appends actually disturbed.
    * Keys are assumed unique in the rewrite set (ties at a file
    * boundary would make the packing order-ambiguous).
    *
    * @param rows     (file_id, k) current table rows
    * @param manifest (file_id, clustered, n_rows, min_key, max_key)
    * @return per-file audit: (phase ∈ carried|rewritten_src|new,
    *         file_id, n_rows, min_key, max_key) */
  def incrementalOptimize(rows: DataFrame, manifest: DataFrame,
      targetRows: Long, freshBase: Long,
      bucketWidth: Long = 4096L): DataFrame = {
    val app = manifest.filter(!col("clustered"))
    val appEnv = broadcast(app.select(col("min_key").as("a_lo"),
      col("max_key").as("a_hi")))
    val overlapped = manifest.filter(col("clustered"))
      .join(appEnv, col("min_key") <= col("a_hi")
        && col("max_key") >= col("a_lo"), "left_semi")
    val rwIds = overlapped.select("file_id").unionByName(app.select("file_id"))
    val carried = manifest.filter(col("clustered"))
      .join(rwIds, Seq("file_id"), "left_anti")
    val rwSrc = manifest.join(rwIds, Seq("file_id"), "left_semi")
    val rw = rows.join(broadcast(rwIds), Seq("file_id"), "left_semi")
      .select(col("k"),
        expr(s"(k - pmod(k, ${bucketWidth}L)) div ${bucketWidth}L")
          .as("__bkt"),
        lit(1L).as("__one"))
    val newFiles = Packing.twoPhaseRunning(rw, Seq.empty, "__bkt",
        Seq("k"), "__one")
      .select(col("k"),
        (lit(freshBase) + expr(
          s"(__bprefix + __run - 1) div CAST($targetRows AS BIGINT)"))
          .cast("long").as("file_id"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
    def aud(tag: String, df: DataFrame) =
      df.select(lit(tag).as("phase"), col("file_id"), col("n_rows"),
        col("min_key"), col("max_key"))
    aud("carried", carried)
      .unionByName(aud("rewritten_src", rwSrc))
      .unionByName(aud("new", newFiles))
  }

  /** File REBALANCE plan from manifest arithmetic alone — the
    * bin-pack/split planner behind Iceberg's rewrite_data_files,
    * deciding without reading a data byte:
    *
    *  - `split`: a file over 2× `targetRows` rewrites into
    *    ceil(n/target) pieces;
    *  - `merge`: runs of key-CONSECUTIVE small files (< target/2)
    *    coalesce — consecutive matters: merging across an interleaved
    *    big file would create an envelope OVERLAPPING it and WORSEN
    *    [[clusteringDepth]], the exact opposite of maintenance. Runs
    *    are found by the islands trick (file rank − small-file rank is
    *    constant within a run) and each run subdivides by start-offset
    *    prefix sum (the [[incrementalOptimize]] packing rule — a merged
    *    output may overshoot `targetRows` by at most one small file);
    *  - `keep`: everything else.
    *
    * All windows run over the manifest frame (file count, never rows).
    * Ranks order by (min_key, file_id) — the file_id tie-break matters
    * for OVERLAPPING manifests (two hash-layout files legally share a
    * min_key), where min_key alone would leave row_number, run ids,
    * and merge_group nondeterministic (round-14 advisory).
    * Returns (file_id, n_rows, min_key, max_key, action, pieces,
    * merge_group) — pieces > 1 only for splits; merge_group is a
    * stable (run-head rank, subgroup) label, −1 for non-merges. */
  def rebalancePlan(manifest: DataFrame, targetRows: Long): DataFrame = {
    require(targetRows >= 2, s"targetRows: $targetRows")
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.orderBy(col("min_key"), col("file_id"))
    val base = manifest
      .select(col("file_id"), col("n_rows"), col("min_key"), col("max_key"))
      .withColumn("_rk", row_number().over(byKey).cast("long"))
      .withColumn("_small", col("n_rows") * 2L < targetRows)
    val smalls = base.where(col("_small"))
      .withColumn("_srk", row_number().over(byKey).cast("long"))
      .withColumn("_run", col("_rk") - col("_srk"))
      .withColumn("_before", coalesce(sum(col("n_rows")).over(
        Window.partitionBy(col("_run")).orderBy(col("min_key"), col("file_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_sub", expr(s"_before div $targetRows"))
      // run id × 1000 + subgroup = a stable, engine-replayable label
      // (run id = rank − small-rank, constant within a run, distinct
      // across runs). The packing needs < 1000 subgroups per run; a
      // run that overflows (≥ 1000·targetRows small rows in one run)
      // would silently alias labels ACROSS runs, so the bound is
      // enforced loudly instead of assumed (round-14 advisory)
      .withColumn("_sub",
        when(col("_sub") >= 1000L, raise_error(format_string(
          "rebalancePlan: merge run %s packs into >= 1000 subgroups — " +
            "the packed run*1000+sub label would alias across runs; " +
            "raise targetRows or split the maintenance window",
          col("_run").cast("string"))))
          .otherwise(col("_sub")))
      .withColumn("merge_group", col("_run") * 1000L + col("_sub"))
      .select(col("file_id"), lit("merge").as("action"), lit(1L).as("pieces"),
        col("merge_group"))
    val rest = base.where(!col("_small"))
      .select(col("file_id"),
        when(col("n_rows") > 2L * targetRows, "split").otherwise("keep")
          .as("action"),
        when(col("n_rows") > 2L * targetRows,
          expr(s"(n_rows + $targetRows - 1) div $targetRows"))
          .otherwise(1L).as("pieces"),
        lit(-1L).as("merge_group"))
    base.select(col("file_id"), col("n_rows"), col("min_key"), col("max_key"))
      .join(smalls.unionByName(rest), "file_id")
  }

  /** Clustering-health report: the OVERLAP-DEPTH profile of a
    * manifest's zone envelopes — at any key k, depth(k) = how many
    * files' [min_key, max_key] envelopes contain k = how many files a
    * point probe at k must read. The metric behind "when is OPTIMIZE
    * worth it": a perfectly clustered table reports depth 1
    * everywhere; every hash-layout file adds a full-span +1. Computed
    * by BOUNDARY SWEEP in exact integers: +1 at min_key, −1 at
    * max_key+1, running sum over the sorted distinct boundaries —
    * 2·files events regardless of table rows, so the ordered window
    * runs over a manifest-sized frame (the house bucket-frame rule)
    * and the whole report never reads a data byte.
    *
    * @param manifest (file_id, n_rows, min_key, max_key)
    * @return (depth, n_segments, span) — for each occupied depth, how
    *         many key segments sit at it and their total key width */
  /** EQUI-DEPTH layout plan: file boundaries from EXACT key quantiles
    * (the [[Quantiles.histExactQuantiles]] machinery — ceil(n·i/files)
    * order statistics, integer targets, histogram frame), so every
    * file gets ~n/files ROWS regardless of key skew — the planning
    * step Spark's own range partitioner approximates by SAMPLING,
    * done exactly: a skewed key domain (half the table in one decade
    * of keys) silently unbalances equi-WIDTH files (`k div w`), while
    * equi-depth bounds follow the mass. Assignment is file_id =
    * #boundaries below k, computed per row against the broadcast
    * (files−1)-element boundary array — no sampling, no sort, no
    * driver-side collect; heavy duplicate keys at a boundary stay
    * together (both engines assign by the same strict `>`).
    * Returns the [[Snapshot.manifestEntriesBy]] manifest of the plan:
    * (version, file_id, n_rows, min_key, max_key) with disjoint
    * envelopes by construction. */
  def equiDepthPlan(df: DataFrame, key: Column, files: Int,
      version: Long = 1L): DataFrame =
    Snapshot.manifestEntriesBy(equiDepthAssign(df, key, files),
      col("fid"), col("k"), version)

  /** [[equiDepthPlan]]'s row half: the per-row file assignment
    * (k, fid) against the exact-quantile boundary array — exposed so a
    * maintenance EXECUTOR can materialize the layout the plan
    * describes (the q318 composition: plan from arithmetic, execute by
    * regrouping rows, re-measure, assert they agree). */
  def equiDepthAssign(df: DataFrame, key: Column, files: Int): DataFrame = {
    require(files >= 2, s"files: $files")
    val rows = df.select(key.cast("long").as("k"))
    val qs = (1 until files).map(i => (i, files))
    val bounds = Quantiles.histExactQuantiles(rows, lit("all"), col("k"), qs)
      .agg(sort_array(collect_list(col("value"))).as("bs"))
    rows.crossJoin(broadcast(bounds))
      .select(col("k"), aggregate(col("bs"), lit(0L),
        (acc, b) => acc + when(col("k") > b, 1L).otherwise(0L)).as("fid"))
  }

  /** Per-file COLUMN STATS for a low-cardinality column — the exact
    * sibling of the per-file Bloom index (q202): n_rows, null count,
    * and the DISTINCT VALUE SET when it fits under `maxDistinct`
    * (else null = "unknown, cannot prune" — the stats stay honest
    * instead of silently lossy; Iceberg's per-file bounds have the
    * same contract). For an equality predicate the touch set is an
    * exact manifest lookup — no false positives, unlike the bloom —
    * which is the right index for enum-like columns (status flags,
    * country codes) where the whole set is a few bytes. Values are
    * emitted as a sorted comma-joined string so the stats row is
    * engine-portable — which makes ',' a RESERVED separator: a value
    * containing it would corrupt the split()/array_contains round-trip
    * every pruning consumer relies on, so such a value raises loudly
    * at build time instead of silently poisoning the index (round-14
    * advisory). A file whose column is entirely NULL emits vals = ""
    * — the KNOWN-empty set, the strongest possible stats row (every
    * equality predicate prunes it), distinct from null = "overflowed
    * the cap, cannot prune". Returns (file_id, n_rows, n_nulls, vals). */
  def columnStats(df: DataFrame, fileId: Column, value: Column,
      maxDistinct: Int = 16): DataFrame =
    df.select(fileId.as("file_id"),
        when(value.cast("string").contains(","), raise_error(format_string(
          "columnStats: value contains the ',' set separator: %s",
          value.cast("string"))))
          .otherwise(value.cast("string")).as("v"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        when(size(collect_set(col("v"))) <= maxDistinct,
          concat_ws(",", sort_array(collect_set(col("v")))))
          .as("vals"))

  /** INDEX ADVISOR for one column, decided from its [[columnStats]]
    * frame alone — the per-column arm of the maintenance-runbook
    * family: if EVERY file's distinct set fit under the stats cap
    * (no null `vals`), the exact value-set index is strictly better
    * (bytes-small, zero false positives, zero false negatives —
    * q316's contract), so that is the decision; any overflowed file
    * means equality pruning needs the [[Bloom]] bitset arm instead
    * (no false negatives, bounded false positives). Reads the stats
    * frame only — never a data byte; files-sized input, 1-row output
    * (n_files, n_overflow, decision). */
  def adviseColumnIndex(stats: DataFrame): DataFrame =
    stats.agg(count(lit(1)).as("n_files"),
        sum(when(col("vals").isNull, 1L).otherwise(0L)).as("n_overflow"))
      .select(col("n_files"), col("n_overflow"),
        when(col("n_overflow") === 0L, "value_set").otherwise("bloom")
          .as("decision"))

  /** MAINTENANCE ROUTER — which maintenance does a table need, decided
    * from its manifest alone: overlapping envelopes (max overlap depth
    * > 1) mean clustering is broken and only a full REWRITE
    * ([[equiDepthPlan]]) restores depth-1 probes; a disjoint layout
    * with undersized/oversized files wants the cheap incremental
    * REBALANCE ([[rebalancePlan]] — which by the islands rule cannot
    * worsen depth); a disjoint, well-sized layout needs NONE. This is
    * the dispatch step of the schedule-maintenance runbook, above the
    * per-plan operators the q318/q323 executors gate. File-count-sized
    * aggregates only; never reads a data byte. Returns one row:
    * (n_files, max_depth, n_small, n_oversized, decision). */
  def adviseMaintenance(manifest: DataFrame, targetRows: Long): DataFrame = {
    require(targetRows >= 2, s"targetRows: $targetRows")
    val depth = broadcast(clusteringDepth(manifest)
      .agg(coalesce(max(col("depth")), lit(0L)).as("max_depth")))
    manifest.agg(count(lit(1)).as("n_files"),
        coalesce(sum(when(col("n_rows") * 2L < targetRows, 1L)
          .otherwise(0L)), lit(0L)).as("n_small"),
        coalesce(sum(when(col("n_rows") > 2L * targetRows, 1L)
          .otherwise(0L)), lit(0L)).as("n_oversized"))
      .crossJoin(depth)
      .select(col("n_files"), col("max_depth"), col("n_small"),
        col("n_oversized"),
        when(col("max_depth") > 1L, "rewrite")
          .when(col("n_small") + col("n_oversized") > 0L, "rebalance")
          .otherwise("none").as("decision"))
  }

  def clusteringDepth(manifest: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = manifest
      .select(col("min_key").cast("long").as("k"), lit(1L).as("delta"))
      .unionByName(manifest.select((col("max_key").cast("long") + 1L).as("k"),
        lit(-1L).as("delta")))
      .groupBy("k").agg(sum(col("delta")).as("d"))
    val w = Window.orderBy("k")
    bounds
      .withColumn("depth", sum(col("d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("next_k", lead(col("k"), 1).over(w))
      .where(col("next_k").isNotNull && col("depth") > 0L)
      .groupBy("depth")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("next_k") - col("k")).as("span"))
  }
}
