package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Per-group top-k as a first-class plan operator — the (c) rung of the
  * custom-operator ladder: LogicalPlan node + SparkStrategy + physical
  * operators, injectable via SparkSessionExtensions (or
  * `spark.experimental.extraStrategies` on a live session).
  *
  * Why not `row_number().over(window) <= k`? The window plan shuffles and
  * SORTS every row of every group; at 100 TB that sort dominates. This
  * operator keeps a bounded k-row heap per group: the partial stage prunes
  * each map partition to ≤ k rows per group BEFORE the exchange (the
  * shuffle then moves at most k·partitions rows per group, not the group),
  * and the final stage merges heaps and emits ranks. It is the grouped
  * generalization of Catalyst's own global TakeOrderedAndProject.
  */
object TopKPerGroup {

  // -------------------------------------------------------------- logical

  final case class Node(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rankAttr: Attribute, child: LogicalPlan)
      extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
    override protected def withNewChildInternal(newChild: LogicalPlan): Node =
      copy(child = newChild)
  }

  // ------------------------------------------------------------- physical

  /** Shared heap logic: fold rows into per-group bounded heaps.
    * The heap is worst-on-top (reverse ordering) so eviction is O(log k).
    */
  private def foldIntoHeaps(
      iter: Iterator[InternalRow], groupProj: UnsafeProjection,
      ordering: Ordering[InternalRow], k: Int)
      : scala.collection.mutable.LinkedHashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]] = {
    val heaps = scala.collection.mutable.LinkedHashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
    val worstFirst: Ordering[InternalRow] = ordering // max-heap: worst on top
    iter.foreach { row =>
      val key = groupProj(row)
      val heap = heaps.getOrElseUpdate(key.copy(),
        scala.collection.mutable.PriorityQueue.empty(worstFirst))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ordering.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
    }
    heaps
  }

  /** Map-side stage: prunes every partition to ≤ k rows per group. */
  final case class TopKPartialExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                               k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override protected def doExecute(): RDD[InternalRow] = {
      val (g, o, out) = (groupExprs, order, child.output)
      val kk = k
      child.execute().mapPartitions({ iter =>
        val proj = UnsafeProjection.create(g, out)
        val ord = GenerateOrdering.generate(o, out)
        foldIntoHeaps(iter, proj, ord, kk).iterator.flatMap(_._2)
      }, preservesPartitioning = true)
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
      copy(child = newChild)
  }

  /** Reduce-side stage: requires clustering by group, merges the partial
    * heaps, emits each group's rows best-first with a 1-based rank.
    */
  final case class TopKFinalExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                             k: Int, rankAttr: Attribute, child: SparkPlan)
      extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def outputPartitioning: Partitioning = child.outputPartitioning
    // empty grouping = GLOBAL top-k: all partial heaps must meet in one
    // place (AllTuples → single-partition exchange), else every partition
    // would emit its own k rows with ranks 1..k
    override def requiredChildDistribution: Seq[Distribution] =
      if (groupExprs.isEmpty) Seq(AllTuples)
      else Seq(ClusteredDistribution(groupExprs))
    override protected def doExecute(): RDD[InternalRow] = {
      val (g, o, out, outAll) = (groupExprs, order, child.output, output)
      val kk = k
      child.execute().mapPartitions({ iter =>
        val proj = UnsafeProjection.create(g, out)
        val ord = GenerateOrdering.generate(o, out)
        val toUnsafe = UnsafeProjection.create(outAll, outAll)
        val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
        foldIntoHeaps(iter, proj, ord, kk).iterator.flatMap { case (_, heap) =>
          val best = heap.dequeueAll.reverse // worst-first heap → best-first list
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
          best.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, if (rankIsInt) i + 1 else (i + 1).toLong)
            toUnsafe(joined(row, rankRow))
          }
        }
      }, preservesPartitioning = true)
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
      copy(child = newChild)
  }

  // ------------------------------------------------------------- strategy

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Node(g, o, k, rank, child) =>
        TopKFinalExec(g, o, k, rank,
          TopKPartialExec(g, o, k, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  // ------------------------------------------------------------ optimizer

  /** Rewrites the window idiom `row_number().over(partitionBy g orderBy o)
    * <= k` into [[Node]] — users keep writing the standard pattern and get
    * the bounded-heap operator for free. Only `row_number` qualifies
    * (`rank`/`dense_rank` can emit > k rows per group on ties). Spark's own
    * WindowGroupLimit (3.5+) prunes below the Window but still sorts every
    * surviving row; this rewrite removes the sort entirely, so an inserted
    * WindowGroupLimit child is subsumed and stripped. The rank attribute's
    * exprId and IntegerType are preserved, making the rewrite transparent
    * to downstream references. Registered via [[GraftExtensions]] or
    * `spark.experimental.extraOptimizations`.
    */
  object TopKRewrite extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window, WindowGroupLimit}

    private object RankLimit {
      def unapply(cond: Expression): Option[(Attribute, Int)] = cond match {
        case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
        case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
        case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
        case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k - 1))
        case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
        case _ => None
      }
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case Filter(RankLimit(rn, k),
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _))
          if k > 0 && order.nonEmpty && alias.exprId == rn.exprId =>
        // an already-inserted WindowGroupLimit is subsumed by the heap
        val base = wchild match {
          case WindowGroupLimit(_, _, _, _, gchild) => gchild
          case other => other
        }
        Node(part, order, k, alias.toAttribute, base)
    }
  }

  // ------------------------------------------------------------------ API

  /** `perGroup(df, groupCols, orderCols, k)`: for each group, the k best
    * rows by `orderCols` (`(name, descending?)` pairs), with a `rank`
    * column (1 = best). Ties must be broken by the ordering for a
    * deterministic result. Column names, not Columns — this operator
    * serves the engine's dynamic-schema surface.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = GraftSqlShim.analyzedPlan(df)
    def resolve(name: String): Attribute =
      child.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    val order = orderCols.map { case (name, desc) =>
      SortOrder(resolve(name), if (desc) Descending else Ascending)
    }
    val rank = AttributeReference("rank", LongType, nullable = false)()
    GraftSqlShim.ofRows(spark,
      Node(groupCols.map(resolve), order, k, rank, child))
  }

  /** Registers the strategy on a live session (idempotent); the
    * extensions path ([[GraftExtensions]]) covers session-build time.
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
