package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
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
  * ClusteredDistribution on the group keys, so EnsureRequirements
  * inserts the hash exchange between the two — the same planning
  * contract as partial/final aggregates. Per-partition state is one
  * bounded heap (≤ k row copies) per group seen in that partition —
  * the hash-aggregate memory envelope with k-row values. */
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

  override def outputPartitioning = child.outputPartitioning

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val ordE = ordering
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord = new LazilyGeneratedOrdering(ordE, childOutput)
      // max-heap under `ord`: the root is the WORST retained row, so a
      // new row enters iff it beats the root once the heap is full
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
