package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.types.LongType

/** Whole-operator top-k-per-group (SURVEY §9.2): a first-class
  * LogicalPlan + Strategy + SparkPlan, the "engine, not library" path.
  *
  * Why not a window function: `row_number().over(partitionBy(g)
  * .orderBy(o)) <= k` totally SORTS every group after a full shuffle —
  * O(n log n) per group and the whole input crosses the wire. Why not
  * the Aggregator ([[graft.functions.TopKAggregator]]): correct
  * bounded-state shape, but every row round-trips through the typed
  * encoder (object ser/de) and the merge buffers are JVM objects.
  *
  * This operator keeps rows as UnsafeRows end to end and plans as TWO
  * physical stages, mirroring partial/final aggregation:
  *
  *   TopKPerGroupExec(final)   — requires ClusteredDistribution(group)
  *     +- Exchange(group)      — inserted by EnsureRequirements
  *        +- TopKPerGroupExec(partial) — any distribution
  *           +- child
  *
  * The partial stage prunes each input partition to ≤ k rows per group
  * before the shuffle (the map-side combine), so at 100 TB the exchange
  * carries O(groups·k) rows, not the input. State per task is a hash
  * map of group-key → k-row bound insertion buffer: O(groups-in-
  * partition · k), the same bound the Aggregator had, minus the ser/de.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is born here, not read from below — without this the
  // analyzer flags it as a missing input
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Physical node; `partial = true` is the pre-shuffle prune (same
  * output as child), `partial = false` merges per group and appends
  * the 1-based rank column.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val sortE = ordering
    val kk = k
    val isPartial = partial
    val outAttrs = output
    // Partial-stage memory bound: unlike Spark's partial HashAggregate
    // (fixed-width buffers inside an UnsafeFixedWidthAggregationMap that
    // spills), this map holds up to k COPIED child rows per group, so a
    // high-group-cardinality partition at 100 TB would otherwise buffer
    // ~the whole partition. When the map reaches this many groups it is
    // FLUSHED to output and restarted — partial output may then carry up
    // to k rows per group per flush window, which the final stage merges
    // back to an exact top-k (same contract as partial-agg re-merge).
    val flushLimit = math.max(1,
      conf.getConfString("spark.graft.topkPartialFlushGroups", "32768").toInt)
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupE, childOutput)
      val ord = RowOrdering.create(sortE, childOutput)
      // group-key → rows sorted best-first, bounded at k. Linear
      // insertion: k is small by contract (top-k, not top-millions);
      // each insert is ≤ k comparisons against already-pruned rows.
      val groups = new java.util.HashMap[UnsafeRow, java.util.ArrayList[InternalRow]]()
      def insert(row: InternalRow): Unit = {
        val key = groupProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = new java.util.ArrayList[InternalRow](kk)
          groups.put(key.copy(), buf)
        }
        val n = buf.size()
        if (n < kk || ord.compare(row, buf.get(n - 1)) < 0) {
          var i = n
          while (i > 0 && ord.compare(row, buf.get(i - 1)) < 0) i -= 1
          buf.add(i, row.copy())
          if (buf.size() > kk) buf.remove(kk)
        }
      }
      if (isPartial) {
        // Streaming build/drain: consume input until the group cap,
        // drain the map to output, repeat until the input is exhausted.
        new Iterator[InternalRow] {
          private var drain: java.util.Iterator[java.util.ArrayList[InternalRow]] =
            java.util.Collections.emptyIterator()
          private var cur: java.util.Iterator[InternalRow] =
            java.util.Collections.emptyIterator()
          private def fill(): Unit = {
            while (iter.hasNext && groups.size() < flushLimit) insert(iter.next())
            val vals = new java.util.ArrayList(groups.values())
            groups.clear()
            drain = vals.iterator()
          }
          override def hasNext: Boolean = {
            while (!cur.hasNext) {
              if (drain.hasNext) cur = drain.next().iterator()
              else if (iter.hasNext) fill()
              else return false
            }
            true
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        // Final stage: ClusteredDistribution guarantees every row of a
        // group is in this partition, so the full build must complete
        // before ranks are emitted; state is O(groups-in-partition · k),
        // the operator's inherent output size.
        while (iter.hasNext) insert(iter.next())
        val entries = groups.values().iterator()
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        new Iterator[InternalRow] {
          private var cur: java.util.ArrayList[InternalRow] = _
          private var i = 0
          override def hasNext: Boolean = {
            while ((cur == null || i >= cur.size()) && entries.hasNext) {
              cur = entries.next(); i = 0
            }
            cur != null && i < cur.size()
          }
          override def next(): InternalRow = {
            rankRow.setLong(0, i + 1L)
            val out = proj(joined(cur.get(i), rankRow))
            i += 1
            out
          }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Planner rule: lower the logical node to the partial/final pair. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, ord, k, rank, child) =>
      val pre = TopKPerGroupExec(g, ord, k, None, partial = true, planLater(child))
      TopKPerGroupExec(g, ord, k, Some(rank), partial = false, pre) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `GraftOps.topKPerGroup(df, groups, orders, k)`
  * appends a 1-based `rn` per group. Order columns are (name,
  * descending?) pairs over EXISTING columns — materialize computed
  * sort keys with `.withColumn` first (and drop them after); binding
  * directly to the child's resolved attributes sidesteps the Column →
  * ColumnNode indirection, which the analyzer only unwraps for
  * built-in operators. Order columns should carry a full tiebreak for
  * deterministic picks (same contract as row_number).
  */
object GraftOps {
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderCols: Seq[(String, Boolean)],
                   k: Int, rankName: String = "rn"): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column '$n' not among ${child.output.map(_.name).mkString(", ")}"))
    val g = groupCols.map(attr)
    val ord = orderCols.map { case (n, desc) =>
      SortOrder(attr(n),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlShim.dataFrame(df.sparkSession, TopKPerGroup(g, ord, k, rank, child))
  }
}
