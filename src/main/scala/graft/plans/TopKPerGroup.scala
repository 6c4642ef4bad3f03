package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Native top-k-per-group operator — the full custom-operator stack
  * (LogicalPlan node → SparkStrategy → two-phase SparkPlan), the
  * engine's (c)-tier extension point for semantics the built-in
  * operators can't express *efficiently*.
  *
  * The built-in formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * o) <= k`, used by q_topk_per_group) shuffles **every** row to its
  * group's reducer and sorts whole partitions. This operator runs a
  * partial pass with bounded per-group heaps before the exchange, so at
  * most k rows per (group, input partition) are shuffled, then a final
  * heap pass assigns ranks — the same partial-aggregation shape Spark
  * applies to hash aggregates, applied to top-k. At 100 TB the shuffle
  * shrinks from the full fact table to k·partitions rows per group, and
  * nothing is ever sorted beyond the k kept rows.
  *
  * Memory gate: the PARTIAL pass pins (groups-per-partition × k) rows,
  * which a group-cardinality explosion (group ≈ unique key) turns into
  * the whole partition. When pinned rows exceed
  * `spark.graft.topk.partialMaxRows` (default 4M) the pass FLUSHES:
  * emits every held row downstream and restarts with an empty heap map.
  * Correct because the partial output is a candidate superset, not a
  * final answer — a row in the partition's true top-k has at most k−1
  * better rows in its own flush segment, so it survives its segment's
  * heap and reaches the final pass. Cost of a flush is only extra
  * shuffled rows (up to k per group per segment); memory stays bounded
  * at the threshold for any group cardinality. The FINAL pass cannot
  * flush (ranks need complete groups); its memory is
  * groups-per-reducer-partition × k, the hash-aggregate shape, scaled
  * down by however many shuffle partitions the exchange provides. */
case class TopKPerGroupNode(k: Int, groupExprs: Seq[Attribute],
    ordering: Seq[SortOrder], rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rnk originates here, not in the child — without this CheckAnalysis
  // reports it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerGroupNode = copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  val PartialMaxRowsKey = "spark.graft.topk.partialMaxRows"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      val maxRows = SparkSession.getActiveSession
        .flatMap(_.conf.getOption(PartialMaxRowsKey))
        .map(_.toLong).getOrElse(4L * 1024 * 1024)
      val partial = TopKPerGroupExec(n.k, n.groupExprs, n.ordering,
        rankAttr = None, partial = true, maxRows, planLater(n.child))
      TopKPerGroupExec(n.k, n.groupExprs, n.ordering,
        rankAttr = Some(n.rankAttr), partial = false, maxRows,
        partial) :: Nil
    case _ => Nil
  }
}

/** Physical top-k-per-group. `partial = true` emits the ≤k best rows of
  * each group seen in each input partition (no distribution requirement,
  * no rank); `partial = false` requires clustering on the group key and
  * emits rank 1..k per group. */
case class TopKPerGroupExec(k: Int, groupExprs: Seq[Attribute],
    ordering: Seq[SortOrder], rankAttr: Option[AttributeReference],
    partial: Boolean, partialMaxRows: Long, child: SparkPlan)
    extends UnaryExecNode {

  override lazy val metrics = Map(
    "partialFlushes" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial heap flushes"))

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerGroupExec = copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val groupAttrs = groupExprs
    val sortOrders = ordering
    val emitRank = rankAttr.isDefined
    val outAttrs = output
    val isPartial = partial
    val maxPinned = if (partial) partialMaxRows else Long.MaxValue
    val flushMetric = longMetric("partialFlushes")
    // Codegen'd row comparator — the TakeOrderedAndProject discipline:
    // LazilyGeneratedOrdering serializes the SortOrder spec and compiles
    // a comparator on each executor (Janino), handling direction + null
    // ordering natively. Beats the previous interpreted design twice
    // over: no per-row key extraction into boxed Array[Any] (and no
    // manual UTF8String/ArrayData detach-copies — whole-row copies
    // already own their buffers), and each compare is a compiled field
    // access instead of an Ordering[Any] chain. Heap ops re-evaluate
    // the sort expressions per comparison; order keys here are column
    // references, so that is exactly the cheap path.
    val rowOrd = new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(sortOrders.map(so =>
        so.copy(child = BindReferences.bindReference(so.child, childOutput))))
    child.execute().mapPartitions { it =>
      val groupProj = UnsafeProjection.create(groupAttrs, childOutput)
      // max-heap: the worst kept row sits on top and is evicted first
      // (PriorityQueue surfaces the LARGEST per rowOrd = sorts-last)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        private val heaps = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.PriorityQueue[InternalRow]]()
        private var pinned = 0L
        private var current: Iterator[InternalRow] = Iterator.empty

        /** Consume input until the heap map hits the pin bound (partial
          * only) or the input ends; returns false when input AND heaps
          * are both exhausted. */
        private def fill(): Boolean = {
          var hitBound = false
          while (it.hasNext && !hitBound) {
            val row = it.next() // InternalRow contract — no UnsafeRow cast
            val g = groupProj(row)
            var heap = heaps.get(g)
            if (heap == null) {
              heap = scala.collection.mutable.PriorityQueue
                .empty[InternalRow](rowOrd)
              heaps.put(g.copy(), heap)
            }
            if (heap.size < kLocal) {
              heap.enqueue(row.copy()); pinned += 1
              if (pinned >= maxPinned) {
                hitBound = true
                if (isPartial) flushMetric.add(1)
              }
            } else if (rowOrd.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          }
          heaps.size() > 0
        }

        /** Emit everything currently held and reset — the flush that
          * bounds partial-pass memory under group-cardinality blowup. */
        private def drain(): Iterator[InternalRow] = {
          val held = new Array[
            scala.collection.mutable.PriorityQueue[InternalRow]](heaps.size())
          val vs = heaps.values().iterator()
          var i = 0
          while (vs.hasNext) { held(i) = vs.next(); i += 1 }
          heaps.clear(); pinned = 0
          held.iterator.flatMap { heap =>
            // dequeueAll yields worst-first; reverse for rank order
            val best = heap.dequeueAll.reverse
            if (!emitRank) best.iterator
            else best.iterator.zipWithIndex.map { case (row, j) =>
              outProj(new JoinedRow(row,
                new GenericInternalRow(Array[Any](j + 1))))
            }
          }
        }

        override def hasNext: Boolean = {
          while (!current.hasNext && (it.hasNext || heaps.size() > 0)) {
            if (fill()) current = drain()
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }
}

/** DataFrame-level entry point: top `k` rows per `groupCols`, best-first
  * by `orderCol` descending with `tieCols` ascending as the total-order
  * tie-break, rank exposed as `rnk`. Installs the planner strategy into
  * the session on first use (`experimental.extraStrategies` — the
  * runtime-injectable equivalent of SparkSessionExtensions'
  * injectPlannerStrategy). */
object TopKPerGroup {
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String,
      tieCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (ClusteredDistribution rejects Nil)")
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        TopKPerGroupStrategy +: spark.experimental.extraStrategies
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(",")}"))
    val ordering = SortOrder(attr(orderCol), Descending) +:
      tieCols.map(c => SortOrder(attr(c), Ascending))
    val node = TopKPerGroupNode(k, groupCols.map(attr), ordering,
      AttributeReference("rnk", IntegerType, nullable = false)(), lp)
    org.apache.spark.sql.graftx.GraftDataset.ofRows(spark, node)
  }
}
