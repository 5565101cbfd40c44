package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min frequency sketch: bounded-size frequency table whose
  * estimates only ever OVERcount (est ≥ exact, always) — the standard
  * heavy-hitter sketch for streams and multi-pass-too-expensive scans.
  * Like the KMV sketch it is chosen for engine-portable determinism:
  * counters are plain sums over fixed hash positions, so the sketch
  * merges exactly (sum of sketches = sketch of union), survives
  * retries, and a SQL oracle can replay counters AND estimates. State
  * is d·w counters per sketch regardless of key cardinality: at
  * 100 TB the sketch build is one groupBy over d·w cells.
  */
object Frequency {

  private def pos(key: Column, j: Int, w: Int, salt: String): Column =
    Dedup.saltedPos(key, j, w, salt)

  /** Build the (r, p, cnt) counter frame: d hash rows of width w. */
  def countMin(df: DataFrame, key: Column, w: Int, d: Int,
      salt: String): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16)
    (0 until d).map { j =>
      df.select(lit(j).as("r"), pos(key, j, w, salt).as("p"))
    }.reduce(_ union _)
      .groupBy("r", "p").agg(count(lit(1)).as("cnt"))
  }

  /** Estimate each probe key's frequency: d broadcast joins against the
    * d·w-row counter frame, estimate = min over rows (absent counter =
    * 0). Probe side stays shuffle-free.
    *
    * `est_cnt` is a RESERVED output name; working columns are
    * salt-namespaced (`__cm<h>_{p,q,c}<j>`) so generic probe column
    * names cannot collide, and any reserved-name clash fails loudly
    * here rather than as an ambiguous column downstream. */
  def cmEstimate(probe: DataFrame, key: Column, cm: DataFrame, w: Int,
      d: Int, salt: String): DataFrame = {
    val pfx = s"__cm${(salt.hashCode & Int.MaxValue) % 100000}_"
    val reserved = "est_cnt" +:
      (0 until d).flatMap(j => Seq(s"${pfx}p$j", s"${pfx}q$j", s"${pfx}c$j"))
    val clash = probe.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"probe frame already carries reserved count-min column(s): ${clash.mkString(", ")}")
    var df = probe
    val ests = (0 until d).map { j =>
      val c = cm.where(col("r") === j)
        .select(col("p").as(s"${pfx}q$j"), col("cnt").as(s"${pfx}c$j"))
      df = df.withColumn(s"${pfx}p$j", pos(key, j, w, salt))
        .join(broadcast(c), col(s"${pfx}p$j") === col(s"${pfx}q$j"), "left")
      coalesce(col(s"${pfx}c$j"), lit(0L))
    }
    // least() needs two args — a d=1 sketch's estimate IS its only row
    df.withColumn("est_cnt", if (ests.size == 1) ests.head else least(ests: _*))
      .drop((0 until d).flatMap(j => Seq(s"${pfx}p$j", s"${pfx}q$j", s"${pfx}c$j")): _*)
  }
}
