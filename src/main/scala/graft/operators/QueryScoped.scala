package graft.operators

import org.apache.spark.sql.DataFrame

/** Query-scoped lazy caches (guide §5: unpersist when done).
  *
  * Operators that return LAZY frames sometimes need an intermediate
  * materialized once and read by several branches of the same plan
  * (minhash signatures, the overlap-matrix shingle set). A bare
  * `.cache()` there can never be released — the operator has already
  * returned — so every call leaked one corpus-sized frame into the
  * block manager for the life of the session (the round-16 baseline's
  * 4-8× late-suite wall inflation). The first fix, eager
  * `.localCheckpoint(true)`, made the blocks sweep-visible but costs a
  * SEPARATE materialization job plus block serialization up front —
  * measured 0.5-2.5 s of pure overhead per small query (q42 0.45 →
  * 2.76 s) against the lazy cache's single fused action.
  *
  * This registry keeps the lazy single-action semantics and makes the
  * release explicit: `cached(df)` is a plain `df.cache()` whose handle
  * is remembered; the bench/verify harnesses call `releaseAll()`
  * between queries (alongside their localCheckpoint sweep), and any
  * long-lived embedding application can do the same at its own query
  * boundaries. Frames registered here must be strictly query-internal
  * — nothing cross-query may reference them (the cross-query caches,
  * ExportQueries' entity frames, deliberately do NOT use this). */
object QueryScoped {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Lazy cache + registration for the next boundary sweep. */
  def cached(df: DataFrame): DataFrame = {
    val c = df.cache()
    live.add(c)
    c
  }

  /** Unpersist every registered frame (non-blocking); called by the
    * harnesses between queries. Safe to call concurrently. */
  def releaseAll(): Unit = {
    var d = live.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      d = live.poll()
    }
  }
}
