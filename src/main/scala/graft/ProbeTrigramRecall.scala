package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Trigram-search recall where the ABSOLUTE df cap binds — the probe
  * the round-11 verdict asked for: maxDf=256 was re-verified at
  * fixture scale (16/16 typo recovery), but at 25× hot trigrams are
  * actually DROPPED by the cap, so plant typo queries whose names
  * share those hot trigrams and count recovered/lost.
  *
  * Planted query = every 89th customer's lowercased name with its 3rd
  * character removed (the q229 perturbation). Recall@k = fraction of
  * planted queries whose OWN id appears in the top-k Jaccard ranking
  * served from the df-capped posting index. Alongside recall, the
  * probe reports how hard the cap actually bit: how many distinct
  * trigrams (and what fraction of posting rows) the 256 cap dropped,
  * and the hottest surviving/dropped df — the numbers that tell
  * whether recall held BECAUSE the cap was harmless or DESPITE it
  * biting.
  *
  * Usage: runMain graft.ProbeTrigramRecall [dir] [k] [maxDf]
  */
object ProbeTrigramRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val maxDf = args.lift(2).flatMap(_.toLongOption).getOrElse(256L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Retrieval

    val targets = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long").as("id"),
        lower(col("c_name")).as("nm"))
    val n = targets.count()
    val qs = targets.where(col("id") % 89 === 1)
      .select(col("id").as("qid"),
        concat(substring(col("nm"), 1, 2), expr("substring(nm, 4)")).as("qnm"))
    val planted = qs.count()

    // how hard does the cap bite at this scale?
    val df = Retrieval.trigramIndex(targets, col("id"), col("nm"))
      .groupBy("t3").agg(count(lit(1)).as("df")).persist()
    val capStats = df.agg(
      count(lit(1)).as("trigrams"),
      sum(when(col("df") > maxDf, 1L).otherwise(0L)).as("dropped_trigrams"),
      sum(when(col("df") > maxDf, col("df")).otherwise(0L)).as("dropped_postings"),
      sum(col("df")).as("postings"),
      max(col("df")).as("hottest_df"),
      max(when(col("df") <= maxDf, col("df"))).as("hottest_kept_df")).head()
    df.unpersist()

    val t0 = System.nanoTime()
    val top = Retrieval.trigramTopK(targets, col("id"), col("nm"),
      qs, col("qid"), col("qnm"), k = k, maxDf = maxDf)
    val recovered = top.filter(col("target_id") === col("qid")).count()
    val wall = (System.nanoTime() - t0) / 1e9
    System.err.println(
      f"[trigram-recall] n=$n maxDf=$maxDf k=$k: planted=$planted " +
        f"recovered=$recovered lost=${planted - recovered} " +
        f"recall=${recovered.toDouble / planted}%.3f | cap bite: " +
        f"${capStats.getLong(1)}/${capStats.getLong(0)} trigrams dropped " +
        f"(${100.0 * capStats.getLong(2) / capStats.getLong(3)}%.1f%% of postings), " +
        f"hottest df=${capStats.getLong(4)} kept<=${capStats.getLong(5)} " +
        f"wall=$wall%.1fs")
    spark.stop()
  }
}
