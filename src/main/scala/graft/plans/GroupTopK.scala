package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, NullsFirst, NullsLast, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** GroupTopK — a whole-operator custom plan: top-K rows per group under
  * a sort order, WITHOUT sorting each group's full row set.
  *
  * Spark's native expression of this gesture is
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`,
  * which shuffles every row and sorts every partition. The reference
  * never pays that: its per-leaf top-K keeps a bounded tree and merges
  * bounded results (sketches/results/IntTreeTopK.java, MonoidTopK.java).
  * This operator reproduces that dataflow inside Catalyst:
  *
  *   GroupTopKPartialExec   per input partition: hash map key → K-heap;
  *                          emits ≤K rows per (partition, key)
  *   Exchange (planner-inserted via requiredChildDistribution)
  *   GroupTopKFinalExec     re-heaps per key, emits rows + rank
  *
  * Shuffle volume drops from O(rows) to O(partitions · keys · K).
  * Composing existing operators can't express "partial top-K before the
  * shuffle", which is why this is a LogicalPlan + Strategy rather than
  * a DataFrame combinator (SURVEY.md §7.2 tier (c)).
  */
case class GroupTopKNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object GroupTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(keys, order, k, rankAttr, child) =>
      val planned = planLater(child)
      GroupTopKFinalExec(keys, order, k, rankAttr,
        GroupTopKPartialExec(keys, order, k, planned)) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap collection: one pass over the iterator, K-heap
  * per key (worst row at the heap head).
  */
private[plans] object TopKHeaps {
  def collect(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      cmp: Ordering[InternalRow],
      k: Int): java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]] = {
    // heap head = WORST retained row → reverse comparator
    val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k, cmp.reverse)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (cmp.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
    }
    heaps
  }
}

case class GroupTopKPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = RowOrdering.create(orderExprs, childOutput)
      val heaps = TopKHeaps.collect(iter, keyProj, cmp, limit)
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class GroupTopKFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = RowOrdering.create(orderExprs, childOutput)
      val heaps = TopKHeaps.collect(iter, keyProj, cmp, limit)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow()
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        val rows = new Array[InternalRow](h.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // poll = worst-first
        var rank = 1
        rows.foreach { r =>
          rankRow.update(0, rank)
          buf += outProj(joined(r, rankRow)).copy()
          rank += 1
        }
      }
      buf.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object GroupTopK {
  /** Top-K rows per key group: `df` plus a 1-based `rank` column,
    * keeping only the best `k` rows per group under (orderCol,
    * ascending?, tie-break by the remaining order columns).
    */
  def groupTopK(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int,
      rankName: String = "rank"): DataFrame = {
    import org.apache.spark.sql.graftshim
    val spark = df.sparkSession
    val exp = graftshim.experimentalStrategies(spark)
    if (!exp.extraStrategies.contains(GroupTopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GroupTopKStrategy
    val plan = graftshim.analyzedPlan(df)
    val resolve: String => Attribute = name =>
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    val keys = keyCols.map(resolve(_).asInstanceOf[Expression])
    val order = orderCols.map { case (c, asc) =>
      // hillview missing-sorts-last convention (SURVEY.md §1.2)
      if (asc) SortOrder(resolve(c), Ascending, NullsLast, Seq.empty)
      else SortOrder(resolve(c), Descending, NullsFirst, Seq.empty)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    graftshim.ofRows(spark, GroupTopKNode(keys, order, k, rankAttr, plan))
  }
}
