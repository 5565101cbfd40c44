package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: recall@10 of an approximate ANN arm against the
  * exact brute-force top-10, at any scale directory — the
  * approximation-quality number that pairs with the 25×-decade cost
  * measurements in STRESS.md (cost exponent 0.93 means little if
  * recall collapses with n; this shows whether it does).
  *
  * Three arms, selected by `mode`:
  *  - `fixed <tables>`  — occupancy-sized planes, caller-pinned table
  *    count: the pre-round-11 q179 arm whose decay this probe
  *    originally measured (recall@10 0.40 → 0.22 across 5×).
  *  - `router <cos> <recall>` — the production router
  *    (Similarity.cosineTopKAnnAuto): LSH with tablesNeeded tables
  *    while that fits under 64, trained-IVF beyond; reports which
  *    branch fired and its sizing.
  *  - `ivf <nprobe>` — the IVF branch with an explicit probe width
  *    (k-means k ≈ √n, deterministic init), for calibrating
  *    Similarity.nprobeFor against measured recall.
  *
  * Usage: runMain graft.ProbeAnnRecall [dir] [mode] [args...]
  */
object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("fixed")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // the q179 query sample, capped so the exact baseline stays O(1000·n)
    val qs = e.where(col("vec_id") % 37 === 3 && col("vec_id") < 37L * 1000)
    val n = e.count()
    val planes = Similarity.planesFor(n, 128)
    val exact = Similarity.cosineTopK(qs, e, k = 10)
    val t0 = System.nanoTime()
    val (approx, label) = mode match {
      case "fixed" =>
        val tables = args.lift(2).flatMap(_.toIntOption).getOrElse(4)
        (Similarity.cosineTopKLshTablesAuto(qs, e, k = 10, dim = 64,
          targetBucketSize = 128, tables = tables),
          s"fixed planes=$planes tables=$tables")
      case "router" =>
        val cos = args.lift(2).flatMap(_.toDoubleOption).getOrElse(0.35)
        val rec = args.lift(3).flatMap(_.toDoubleOption).getOrElse(0.9)
        val needed = Similarity.tablesNeeded(planes, cos, rec)
        val branch =
          if (needed <= 8) s"LSH planes=$planes tables=$needed"
          else {
            val cells = Similarity.kFor(n)
            s"IVF cells=$cells nprobe=${Similarity.nprobeFor(cells, rec, cos)} " +
              s"(LSH would need $needed tables)"
          }
        (Similarity.cosineTopKAnnAuto(qs, e, k = 10, dim = 64,
          targetBucketSize = 128, cosTarget = cos, recall = rec),
          s"router cos=$cos recall=$rec -> $branch")
      case "ivf" =>
        // hash-seeded like the production router (the former
        // modulo-step init degenerated on ScaleData's offset ids —
        // 9 effective centroids of 224 — and measured brute-force
        // scans as "recall 1.0"; see nprobeFor's round-12 scaladoc)
        val nprobe = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
        val cells = Similarity.kFor(n)
        val c = e.toDF("id", "vec")
        val cents = Similarity.kmeansCentroids(c,
          Similarity.seedCentroids(c, cells), 64, 2, earlyStop = false)
        (Similarity.ivfTopK(qs, e, cents, k = 10, nprobe = nprobe),
          s"ivf cells=$cells nprobe=$nprobe")
      case "ivfpq" =>
        // the COMPOSED serving shape (AnnIndex.buildPq/queryPq): ADC
        // within nprobe probed cells from packed one-long codes, exact
        // re-rank of a pool sized as a fraction of the probed-cell scan
        // (same 1/40 ratio as ProductQuantizer.rFor, floor 50) — the
        // production IVFPQ memory/recall point this decade table gates
        import graft.operators.AnnIndex
        val rec = args.lift(2).flatMap(_.toDoubleOption).getOrElse(0.9)
        val cells = Similarity.kFor(n)
        val nprobe = args.lift(4).flatMap(_.toIntOption).getOrElse(
          Similarity.nprobeFor(cells, rec))
        val r = args.lift(3).flatMap(_.toIntOption).getOrElse(
          AnnIndex.rForCells(n, cells, nprobe))
        val pqK = args.lift(5).flatMap(_.toIntOption).getOrElse(16)
        val root = java.nio.file.Files
          .createTempDirectory("probe-ivfpq").toString
        AnnIndex.buildPq(spark, root, e, dim = 64, m = 8, pqK = pqK)
        (AnnIndex.queryPq(spark, root, qs, k = 10, dim = 64, m = 8,
          nprobe = nprobe, r = r, pqK = pqK),
          s"ivfpq cells=$cells nprobe=$nprobe r=$r pqK=$pqK")
      case "pq" =>
        // PQ ADC + exact re-rank (operators/ProductQuantizer): recall
        // is governed by whether the true top-10 survive the ADC cut
        // at depth r — the approximation axis the q195 gate pins at
        // the correctness scale and this probe measures against n
        import graft.operators.ProductQuantizer
        val r = args.lift(2).flatMap(_.toIntOption).getOrElse(50)
        val cb = ProductQuantizer.trainCodebooks(e, dim = 64, m = 8, k = 16)
        val codes = ProductQuantizer.encode(e, cb, dim = 64, m = 8)
        (ProductQuantizer.adcTopK(qs, codes, cb, e, dim = 64, m = 8,
          k = 10, r = r),
          s"pq m=8 k=16 r=$r")
      case other => sys.error(s"unknown mode $other")
    }
    val r = Similarity.recallAgainst(exact, approx, s"n=$n $label")
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    // contract-level recall: the router's declared floor covers
    // neighbors AT OR ABOVE cosTarget — exact-top-10 members below it
    // are out of contract (the collision formula cannot see them), so
    // report both numbers and let STRESS.md show the split
    // arg 2 is only the cosine floor for router/fixed modes — ivf/pq
    // use it as nprobe/r, so reinterpreting it here would filter the
    // exact set empty and 0/0 the contract recall
    val cosFloor =
      if (mode == "router" || mode == "fixed")
        args.lift(2).flatMap(_.toDoubleOption).getOrElse(0.35)
      else 0.35
    val rc = Similarity.recallAgainst(
      exact.filter(col("cosine") >= cosFloor), approx, "contract")
      .collect()(0)
    System.err.println(s"[ann-recall] ${r.getString(0)}: " +
      s"exact_pairs=${r.getLong(1)} found=${r.getLong(2)} " +
      f"recall=${r.getDouble(3)}%.3f " +
      s"| cos>=$cosFloor pairs=${rc.getLong(1)} found=${rc.getLong(2)} " +
      f"recall=${rc.getDouble(3)}%.3f wall=$secs%.1fs")
    spark.stop()
  }
}
