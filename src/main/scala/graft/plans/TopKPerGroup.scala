package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator top-k-per-group — the one semantics in the engine
  * that a custom LogicalPlan + SparkStrategy + SparkPlan genuinely
  * beats the built-ins at (builder-brief preference (c)).
  *
  * The DataFrame encoding `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` must shuffle EVERY row to its group's reducer
  * and SORT whole groups there: a 10-million-row group pays a
  * 10-million-row sort to keep 10 rows. This operator runs a bounded
  * per-group heap BEFORE the exchange (each input partition forwards
  * at most k rows per group it saw) and the same heap after it — the
  * shuffle carries ≤ k·groups·partitions rows instead of the corpus,
  * and nothing is ever fully sorted. The classic partial-aggregate
  * trick, applied to an operator Spark only offers in sort form
  * (TakeOrderedAndProjectExec is the GLOBAL top-k; this is the
  * per-group generalization).
  *
  * Semantics: retain the k smallest rows per group under `ordering`
  * (pass .desc columns for largest-first). Output rows are the
  * retained set, order unspecified — pair with a deterministic
  * tie-breaking ordering for engine-portable results.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "topKPerGroup: k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical form: `partial = true` runs per input partition (no
  * distribution requirement); `partial = false` declares
  * ClusteredDistribution on the group keys PLUS a sort on them, so
  * EnsureRequirements inserts the hash exchange and a partial-output-
  * sized sort between the two — the same planning contract as
  * partial/final sort-based aggregates.
  *
  * Memory is bounded at BOTH stages (not just "usually small"):
  *  - partial keeps per-group k-row heaps in a hash map but FLUSHES
  *    the whole map downstream whenever it holds [[TopKPerGroupExec
  *    .FlushRows]] buffered row copies — emitting several partial
  *    heaps for one group is harmless because the final stage
  *    re-merges them, exactly like a hash aggregate falling back to
  *    emitting unmerged partial rows under memory pressure. Worst
  *    case resident: FlushRows + k copied rows, independent of group
  *    cardinality.
  *  - final streams its SORTED input one group at a time with a
  *    single live k-heap, so arbitrarily many groups per reducer cost
  *    k row copies; the sort itself is over the partial output
  *    (≤ k·groups·partitions rows, never the corpus) and spills
  *    through SortExec's managed-memory path. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(groupExprs.map(e => SortOrder(e, Ascending)))

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val ordE = ordering
    val kk = k
    val flushRows = TopKPerGroupExec.FlushRows
    if (partial) child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = new LazilyGeneratedOrdering(ordE, childOutput)
      import scala.jdk.CollectionConverters._
      // one map per flush window; a full window emits and drops, so
      // resident state never exceeds flushRows row copies
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = iter.hasNext
        override def next(): Iterator[InternalRow] = {
          val heaps =
            new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
          var retained = 0L
          while (iter.hasNext && retained < flushRows) {
            val row = iter.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
              heaps.put(key.copy(), heap)
            }
            // max-heap under `ord`: the root is the WORST retained row,
            // so a new row enters iff it beats the root once full
            if (heap.size() < kk) { heap.add(row.copy()); retained += 1 }
            else if (ord.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }
          }
          heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
      }.flatten
    } else child.execute().mapPartitions { iter =>
      // Group-run detection must use the SAME comparison as the
      // required child sort, NOT UnsafeRow byte equality: for
      // float/double group keys, 0.0 and -0.0 (and distinct NaN bit
      // patterns) are sort-EQUAL but byte-DISTINCT — custom execs get
      // no NormalizeFloatingNumbers pass (SPARK-26021 removed -0.0
      // normalization from UnsafeProjection) — so a byte comparison
      // could split one sorted run into interleaved fragments and emit
      // more than k rows for that group (round-12 advisory). Comparing
      // each row against the run's head row under the group-key
      // ordering is exactly the sort's own notion of "same group".
      val groupOrd = new LazilyGeneratedOrdering(
        groupE.map(e => SortOrder(e, Ascending)), childOutput)
      val ord = new LazilyGeneratedOrdering(ordE, childOutput)
      import scala.jdk.CollectionConverters._
      // input is sorted by group key: stream group runs, ONE heap alive
      new Iterator[Iterator[InternalRow]] {
        private var pending: InternalRow =
          if (iter.hasNext) iter.next().copy() else null
        override def hasNext: Boolean = pending != null
        override def next(): Iterator[InternalRow] = {
          val head = pending // a copy; stays valid even if heap-evicted
          val heap =
            new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
          heap.add(head)
          pending = null
          var done = false
          while (!done && iter.hasNext) {
            val row = iter.next()
            if (groupOrd.compare(row, head) == 0) {
              if (heap.size() < kk) heap.add(row.copy())
              else if (ord.compare(row, heap.peek()) < 0) {
                heap.poll(); heap.add(row.copy())
              }
            } else { pending = row.copy(); done = true }
          }
          heap.iterator().asScala
        }
      }.flatten
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-stage buffer bound, in retained row copies. 1M UnsafeRow
    * copies of typical ranker rows (~100 B) is ~100 MB per task —
    * inside an executor-thread share at local[32]/128 GiB and at a
    * 1000-executor cluster's default 1 GiB/core envelope. */
  val FlushRows: Long = 1L << 20
}
