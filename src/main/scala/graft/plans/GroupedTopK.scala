package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LogicalPlan, UnaryNode, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** A whole-operator extension (SURVEY.md §2 tier (c)): grouped top-k as a
  * first-class plan node.
  *
  * Spark 4 already rewrites `row_number() OVER (...) <= k` filters into
  * `WindowGroupLimit(Partial) → Exchange → WindowGroupLimit(Final) →
  * Sort → Window` — which bounds the *shuffle*, but still fully sorts
  * every map partition before the partial limit and again after the
  * exchange. For inputs like an N² kNN pair table, those sorts dominate.
  *
  * [[GroupedTopKLimit]] replaces the whole pattern with a sort-free
  * two-phase bounded heap: map-side k-heaps per key (partial-aggregation
  * shape), a standard Tungsten hash exchange of ≤ partitions·keys·k rows,
  * and a per-key k-merge on the reduce side. Only the ≤ k surviving rows
  * per key are ever ordered.
  *
  * Wiring: [[RewriteRankFilterToTopK]] (optimizer rule) recognizes the
  * window idiom, [[GroupedTopKStrategy]] plans the logical node to
  * [[GroupedTopKLimitPartialExec]] → [[GroupedTopKLimitFinalExec]] (the
  * final node's required clustered distribution makes EnsureRequirements
  * insert the exchange); both are registered in `GraftExtensions`, so
  * every session with the extension gets the fast path for the plain
  * window idiom automatically — the DuckDB oracle for `q_topk_orders`
  * machine-checks the rewrite end-to-end.
  */
case class GroupedTopKLimit(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Attribute,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Rewrites `Filter(rn <= k, Window(row_number() as rn, part, order))` —
  * optionally with extra conjuncts not touching `rn`, which stay behind as
  * a residual filter — into [[GroupedTopKLimit]]. Conservative: fires only
  * for a single row_number window expression with a non-empty partition
  * spec and a literal integer bound. */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rank: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (onRank, residual) = conjuncts.partition(_.references.contains(rank))
    // bound computed in Long so `rn < Int.MinValue` can't wrap positive,
    // and capped below Int.MaxValue so downstream k+1 arithmetic is safe
    val bound: Option[Long] = onRank match {
      case Seq(LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType))) if r.semanticEquals(rank) =>
        Some(v.toLong)
      case Seq(LessThan(r: Attribute, Literal(v: Int, IntegerType))) if r.semanticEquals(rank) =>
        Some(v.toLong - 1L)
      case _ => None
    }
    bound.collect { case k if k > 0 && k < Int.MaxValue => (k.toInt, residual) }
  }

  /** Spark's NormalizeFloatingNumbers batch runs *after* this rule and
    * only matches Window/Aggregate/Join nodes — a rewritten plan would
    * group -0.0 vs 0.0 (and NaN bit patterns) into distinct raw-byte
    * keys. Rather than re-implementing normalization, the rewrite simply
    * refuses float-bearing partition keys (rare for top-k grouping). */
  private def containsFloatingPoint(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case s: StructType => s.fields.exists(f => containsFloatingPoint(f.dataType))
      case a: ArrayType => containsFloatingPoint(a.elementType)
      case m: MapType => containsFloatingPoint(m.keyType) || containsFloatingPoint(m.valueType)
      case _ => false
    }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ LFilter(cond,
        LWindow(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), partSpec, orderSpec, child, _))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          partSpec.forall(e => !containsFloatingPoint(e.dataType)) =>
      rankBound(cond, alias.toAttribute) match {
        case Some((k, residual)) =>
          val topk = GroupedTopKLimit(partSpec, orderSpec, alias.toAttribute, k, child)
          if (residual.isEmpty) topk
          else LFilter(residual.reduce(And), topk)
        case _ => f // degenerate/huge bounds or non-literal: leave the window
      }
  }
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKLimit(partSpec, orderSpec, rankAttr, k, child) =>
      // partial → (Exchange inserted by EnsureRequirements) → final: the
      // same two-phase shape Spark gives WindowGroupLimit, so the shuffle
      // is a standard Tungsten UnsafeRow exchange — not an RDD-level
      // key/value shuffle through the closure serializer
      GroupedTopKLimitFinalExec(partSpec, orderSpec, rankAttr, k,
        GroupedTopKLimitPartialExec(partSpec, orderSpec, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side phase: per input partition, keep only each key's current best k
  * rows via bounded heaps. Pure reduction — output schema, partitioning and
  * ordering are the child's; correctness does not depend on it seeing all
  * of a key's rows. */
case class GroupedTopKLimitPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  /** Map-side distinct-key bound (heaps flush early beyond it — correct,
    * just less reduction). */
  private val maxPartialKeys = 1 << 20

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val maxKeys = maxPartialKeys

    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(ordSpec, childOutput)
      val heapOrd = ord.reverse // max-heap: worst of the kept k on top
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      def drain(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.forEach((_, h) => h.forEach(r => out += r))
        heaps.clear()
        out.iterator
      }
      val flushed = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      rows.foreach { row =>
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          if (heaps.size() >= maxKeys) flushed ++= drain()
          h = new java.util.PriorityQueue[UnsafeRow](kk + 1, heapOrd)
          heaps.put(key.copy(), h)
        }
        if (h.size() < kk) h.add(rowProj(row).copy())
        else if (ord.compare(row, h.peek()) < 0) {
          h.poll()
          h.add(rowProj(row).copy())
        }
      }
      flushed.iterator ++ drain()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: sees every surviving row of a key (the required
  * clustered distribution makes EnsureRequirements insert the hash
  * exchange), k-merges per key and appends the rank. */
case class GroupedTopKLimitFinalExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Attribute,
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution:
      Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(partitionSpec) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val rank = rankAttr

    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val ord = new LazilyGeneratedOrdering(ordSpec, childOutput)
      val groups = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[UnsafeRow]]()
      rows.foreach { row =>
        val key = keyProj(row)
        var buf = groups.get(key)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
          groups.put(key.copy(), buf)
        }
        // the exchange reader reuses its row buffer — copy to retain
        buf += row.asInstanceOf[UnsafeRow].copy()
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(
        (childOutput :+ rank).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      // lazy emission: the grouped input (≤ mapPartitions·k rows per key)
      // must be held to rank, but the output streams. NOTE: this hash
      // grouping is on-heap without spill — memory per reduce task is
      // bounded by its shuffled share (keys·mapPartitions·k rows), which
      // for top-k workloads is the post-limit data, not the raw input;
      // integrating TaskMemoryManager spilling is future work.
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap { buf =>
        buf.sorted(ord).iterator.take(kk).zipWithIndex.map { case (row, r) =>
          rankRow.setInt(0, r + 1)
          outProj(joined(row, rankRow)).copy(): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
