package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a WHOLE-OPERATOR Catalyst extension — the
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan` tier, for the
  * one group-wise shape the built-in operators cannot express without
  * a full per-group sort.
  *
  * The standard idiom (`row_number().over(partitionBy(g).orderBy(o))
  * <= k`, q22) makes the Window operator SORT EVERY GROUP COMPLETELY:
  * at 100 TB a hot group's entire history is shuffled to one task and
  * sorted, O(n log n) and spill-bound, to keep k rows of it. This
  * operator keeps a BOUNDED HEAP of k rows per group instead — two
  * passes, the aggregation-style partial/final split:
  *
  *   - `TopKPerGroupPartialExec` (map side, no distribution
  *     requirement): per input partition, one k-heap per group seen →
  *     at most k·groups rows per partition enter the shuffle, O(n log
  *     k) compares, memory bounded by k·groups-per-partition rows
  *     regardless of skew;
  *   - `TopKPerGroupFinalExec` (requires
  *     `ClusteredDistribution(group)`, so `EnsureRequirements` inserts
  *     the single hash exchange): merges the partial winners — at most
  *     k·partitions candidates per group, NOT the group's full row
  *     count — and emits each group's k best in sort order.
  *
  * The skewed-key picture is the point: a group holding 10 % of the
  * corpus contributes k rows per map partition to the shuffle, where
  * the window idiom ships and sorts all 10 %. (TakeOrderedAndProject
  * does the same trick for the GLOBAL top-k; this is its per-key
  * generalization.)
  *
  * Known bound, stated honestly: the in-memory heap map holds k rows
  * per DISTINCT group per partition and does not spill — the right
  * trade when groups-per-partition × k fits in task memory (the usual
  * top-k-per-entity shape). For ultra-high-cardinality grouping where
  * even k rows per group overflows a task, the sort-based window
  * idiom's external sort is the safer plan; pick per cardinality, the
  * same judgement call Spark itself makes between hash and sort
  * aggregation.
  *
  * Ties are total-ordered by the caller's sort spec (callers append a
  * unique tie-break column, same contract as the window idiom), so
  * results are deterministic and oracle-comparable.
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as final-over-partial heap execs. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupFinalExec(g, o, k,
        TopKPerGroupPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** Shared heap pass: group rows by `groupExprs`, keep the first `k`
    * of each group under `order`, emit per group in sort order. The
    * heap root is the WORST retained row (reverse ordering), so each
    * new row costs one compare against the root, O(log k) on
    * replacement. */
  def topKPartition(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
                    order: Seq[SortOrder], k: Int,
                    input: Seq[Attribute]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, input)
    val ord = new LazilyGeneratedOrdering(order, input)
    val worstFirst = ord.reverse
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap { h =>
      val rows = h.toArray(new Array[InternalRow](h.size))
      java.util.Arrays.sort(rows, ord)
      rows.iterator
    }
  }
}

/** Map-side heap pass: bounds what enters the shuffle to k rows per
  * (group, input partition). */
case class TopKPerGroupPartialExec(groupExprs: Seq[Expression],
                                   order: Seq[SortOrder], k: Int,
                                   child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeaps.topKPartition(_, groupExprs, order, k, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupPartialExec =
    copy(child = newChild)
}

/** Reduce-side merge of the partial winners; the required clustered
  * distribution makes EnsureRequirements insert the one hash
  * exchange. */
case class TopKPerGroupFinalExec(groupExprs: Seq[Expression],
                                 order: Seq[SortOrder], k: Int,
                                 child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      TopKHeaps.topKPartition(_, groupExprs, order, k, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupFinalExec =
    copy(child = newChild)
}

object TopKPerGroup {
  /** The per-key top-k operator: the first `k` rows of each group
    * under `order` (`(column, descending?)` pairs — include a unique
    * tie-break, exactly as the window idiom requires). Registers the
    * strategy on the session's extra-strategies list (idempotent; the
    * `spark.sql.extensions=graft.GraftExtensions` route registers it
    * at session build instead). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(groupCols.nonEmpty,
      "empty groupCols: global top-k is ORDER BY + LIMIT (TakeOrderedAndProject)")
    require(order.nonEmpty, "top-k needs a sort spec (with a unique tie-break)")
    val spark = df.sparkSession
    // check-then-set on the session-global strategy list is racy under
    // concurrent callers; serialize on the session. Appending a dup
    // would be harmless semantically (the strategy is a pure pattern
    // match) but grows the list unboundedly.
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val lp = df.queryExecution.analyzed
    // resolve with the session's own resolver (case sensitivity per
    // spark.sql.caseSensitive) and FAIL on ambiguity — silently taking
    // the first case-insensitive match would mis-bind on plans with
    // duplicate column names (post-join frames)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = lp.output.filter(a => resolver(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"no column '$n' in ${lp.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"ambiguous column '$n': ${many.size} attributes match " +
          s"(${many.map(_.qualifiedName).mkString(", ")}) — disambiguate upstream")
    }
    val sortOrder = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftColumnBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), sortOrder, k, lp))
  }
}
