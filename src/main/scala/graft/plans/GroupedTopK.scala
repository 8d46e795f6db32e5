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
  * [[GroupedTopKLimit]] replaces the whole pattern with a two-phase
  * bounded reduction: map-side k-heaps per key (partial-aggregation
  * shape), a standard Tungsten hash exchange of ≤ partitions·keys·k rows,
  * then a spillable sort of those SURVIVORS feeding an O(1)-memory
  * streaming rank scan. Only rows that already passed the per-key limit
  * are ever sorted — the N² input is never ordered.
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
/** Which ranking function's bounded-filter semantics the operator
  * implements. `row_number() <= k` keeps exactly k rows per key;
  * `rank() <= k` keeps every row with fewer than k strict predecessors in
  * the sort order — tie groups survive whole, so a key may emit more than
  * k rows (exactly like the window function). `dense_rank() <= k` keeps
  * every row whose sort key is among the key's first k DISTINCT sort
  * keys — the map-side keeper is bounded in distinct values, not rows
  * (the row count is the operator's required output, not a leak: a key
  * whose rows all share one value legitimately emits every one). */
sealed trait RankFunctionMode
case object RowNumberMode extends RankFunctionMode
case object RankMode extends RankFunctionMode
case object DenseRankMode extends RankFunctionMode

case class GroupedTopKLimit(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Attribute,
    k: Int,
    mode: RankFunctionMode,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Rewrites `Filter(rn <= k, Window(row_number()|rank()|dense_rank() as
  * rn, part, order))` — optionally with extra conjuncts not touching `rn`,
  * which stay behind as a residual filter — into [[GroupedTopKLimit]].
  * Conservative: fires only for a single ranking window expression with a
  * non-empty partition spec and a literal integer bound; every other
  * window function abstains (see [[RankFunctionMode]]). */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def rankBound(cond: Expression, rank: Attribute): Option[(Int, Seq[Expression])] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (onRank, offRank) = conjuncts.partition(_.references.contains(rank))
    // one rank conjunct with a LITERAL bound drives the heap; every other
    // rank conjunct (e.g. a per-group VARIABLE quota `rn <= budget` — the
    // politeness-budget frontier shape: constant pre-cap bounds the heap,
    // the variable refine filters the survivors) stays residual, which is
    // sound because GroupedTopKLimit emits the rank attribute. Bounds
    // computed in Long so `rn < Int.MinValue` can't wrap positive, and
    // capped below Int.MaxValue so downstream k+1 arithmetic is safe.
    def litBound(e: Expression): Option[Long] = e match {
      case LessThanOrEqual(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
        Some(v.toLong)
      case LessThan(r: Attribute, Literal(v: Int, IntegerType)) if r.semanticEquals(rank) =>
        Some(v.toLong - 1L)
      // the argmax-per-group idiom: `rn = 1` ⇔ `rn <= 1` for ranks that
      // start at 1 (row_number AND rank — rank's top tie group all have
      // rank 1). `rn = k` for k > 1 is NOT a prefix — abstain. Only safe
      // to DROP from the residual when it is the chosen k=1 bound.
      case EqualTo(r: Attribute, Literal(1, IntegerType)) if r.semanticEquals(rank) =>
        Some(1L)
      case EqualTo(Literal(1, IntegerType), r: Attribute) if r.semanticEquals(rank) =>
        Some(1L)
      case _ => None
    }
    val withBounds = onRank.map(e => (e, litBound(e)))
    val literalBounds = withBounds.collect { case (_, Some(b)) => b }
    if (literalBounds.isEmpty) None
    else {
      val k = literalBounds.min
      // literal rank conjuncts are all implied by the min bound the
      // operator enforces; non-literal rank conjuncts survive as residual
      val residual = offRank ++ withBounds.collect { case (e, None) => e }
      if (k > 0 && k < Int.MaxValue) Some((k.toInt, residual)) else None
    }
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

  /** Extractor binding the mode once per match (ntile, aggregates, … fall
    * through: keep the window). */
  private object RankedBy {
    def unapply(fn: Expression): Option[RankFunctionMode] = fn match {
      case RowNumber() => Some(RowNumberMode)
      case Rank(_) => Some(RankMode)
      case DenseRank(_) => Some(DenseRankMode)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ LFilter(cond,
        LWindow(Seq(alias @ Alias(WindowExpression(RankedBy(mode), spec), _)), partSpec, orderSpec, child, _))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          partSpec.forall(e => !containsFloatingPoint(e.dataType)) =>
      rankBound(cond, alias.toAttribute) match {
        case Some((k, residual)) =>
          val topk = GroupedTopKLimit(partSpec, orderSpec, alias.toAttribute, k,
            mode, child)
          if (residual.isEmpty) topk
          else LFilter(residual.reduce(And), topk)
        case _ => f // degenerate/huge bounds or non-literal: leave the window
      }
  }
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKLimit(partSpec, orderSpec, rankAttr, k, mode, child) =>
      // partial → (Exchange inserted by EnsureRequirements) → final: the
      // same two-phase shape Spark gives WindowGroupLimit, so the shuffle
      // is a standard Tungsten UnsafeRow exchange — not an RDD-level
      // key/value shuffle through the closure serializer
      GroupedTopKLimitFinalExec(partSpec, orderSpec, rankAttr, k, mode,
        GroupedTopKLimitPartialExec(partSpec, orderSpec, k, mode, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Map-side phase: per input partition, keep only each key's rows that can
  * still satisfy the rank bound. [[RowNumberMode]] uses a bounded k-heap
  * per key; [[RankMode]] keeps whole tie groups (a row survives iff its
  * local strict-predecessor count is < k, so a tied group is kept or
  * dropped as a unit — see [[TieKeeper]]). Pure reduction — output schema,
  * partitioning and ordering are the child's; correctness does not depend
  * on it seeing all of a key's rows. */
case class GroupedTopKLimitPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    mode: RankFunctionMode,
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
    val keeperMode = mode

    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = new LazilyGeneratedOrdering(ordSpec, childOutput)
      val newKeeper: () => SurvivorKeeper = keeperMode match {
        case RankMode => () => new TieKeeper(kk, ord)
        case DenseRankMode => () => new DenseKeeper(kk, ord)
        case RowNumberMode => () => new HeapKeeper(kk, ord)
      }
      val keepers = new java.util.HashMap[UnsafeRow, SurvivorKeeper]()
      def drain(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        keepers.forEach((_, sk) => sk.foreach(r => out += r))
        keepers.clear()
        out.iterator
      }
      val flushed = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      rows.foreach { row =>
        val key = keyProj(row)
        var sk = keepers.get(key)
        if (sk == null) {
          if (keepers.size() >= maxKeys) flushed ++= drain()
          sk = newKeeper()
          keepers.put(key.copy(), sk)
        }
        sk.add(row, rowProj)
      }
      flushed.iterator ++ drain()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** One key's map-side survivor set: rows that can still satisfy the rank
  * bound. Two implementations share the partial phase's per-key
  * HashMap/flush/drain loop, differing only in the retention rule. */
private[plans] sealed trait SurvivorKeeper {
  def add(row: InternalRow, rowProj: UnsafeProjection): Unit
  def foreach(f: UnsafeRow => Unit): Unit
}

/** `row_number() <= k`: a bounded max-heap of exactly k rows (worst kept
  * row on top). */
private[plans] final class HeapKeeper(k: Int,
    ord: org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering)
    extends SurvivorKeeper {
  private val heap = new java.util.PriorityQueue[UnsafeRow](k + 1, ord.reverse)

  def add(row: InternalRow, rowProj: UnsafeProjection): Unit = {
    if (heap.size() < k) heap.add(rowProj(row).copy())
    else if (ord.compare(row, heap.peek()) < 0) {
      heap.poll()
      heap.add(rowProj(row).copy())
    }
  }

  def foreach(f: UnsafeRow => Unit): Unit = heap.forEach(r => f(r))
}

/** Per-key survivor set for `rank() <= k`: tie groups (rows equal under the
  * sort order) kept whole in a TreeMap ordered by that sort order. A row
  * survives iff the total size of the groups strictly before its own is
  * < k, so the greatest group is evicted wholesale once the rows before it
  * reach k. Memory is bounded by k plus the size of the straddling tie
  * group — which is exactly the operator's required output, not a leak
  * (a key whose rows are all tied legitimately emits every one of them). */
private[plans] final class TieKeeper(k: Int,
    ord: java.util.Comparator[InternalRow]) extends SurvivorKeeper {
  private val groups =
    new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](ord)
  private var total = 0

  def add(row: InternalRow, rowProj: UnsafeProjection): Unit = {
    val last = groups.lastEntry()
    // short-circuit: already ≥ k rows, all ordered before this row
    if (last != null && total >= k && ord.compare(row, last.getKey) > 0) return
    val copy = rowProj(row).copy()
    var lst = groups.get(copy)
    if (lst == null) {
      lst = new java.util.ArrayList[UnsafeRow]()
      groups.put(copy, lst)
    }
    lst.add(copy)
    total += 1
    // evict greatest groups whose strict-predecessor count reached k
    var l = groups.lastEntry()
    while (groups.size() > 1 && total - l.getValue.size() >= k) {
      groups.remove(l.getKey)
      total -= l.getValue.size()
      l = groups.lastEntry()
    }
  }

  def foreach(f: UnsafeRow => Unit): Unit =
    groups.forEach((_, lst) => lst.forEach(r => f(r)))
}

/** Per-key survivor set for `dense_rank() <= k`: rows of the k least
  * DISTINCT order-key values, as a TreeMap of tie groups capped at k
  * entries. Bounded in distinct values, not rows — a group's row count is
  * part of the operator's output (every row tied on a surviving value is
  * emitted), so keeping them is the contract, not a leak. */
private[plans] final class DenseKeeper(k: Int,
    ord: java.util.Comparator[InternalRow]) extends SurvivorKeeper {
  private val groups =
    new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](ord)

  def add(row: InternalRow, rowProj: UnsafeProjection): Unit = {
    val last = groups.lastEntry()
    // short-circuit: k distinct values already kept, all ordered before
    // this row — it would only create the instantly-evicted (k+1)-th group
    if (last != null && groups.size() >= k && ord.compare(row, last.getKey) > 0)
      return
    val copy = rowProj(row).copy()
    var lst = groups.get(copy)
    if (lst == null) {
      lst = new java.util.ArrayList[UnsafeRow]()
      groups.put(copy, lst)
    }
    lst.add(copy)
    while (groups.size() > k) groups.remove(groups.lastKey())
  }

  def foreach(f: UnsafeRow => Unit): Unit =
    groups.forEach((_, lst) => lst.forEach(r => f(r)))
}

/** Reduce-side phase: sees every surviving row of a key (the required
  * clustered distribution makes EnsureRequirements insert the hash
  * exchange) in (key, order) sorted order (the required ordering makes it
  * insert Spark's SPILLABLE external SortExec over the post-limit
  * survivors), and streams each key's run, appending the rank — sequential
  * for [[RowNumberMode]], gap-numbered with whole tie groups for
  * [[RankMode]], gap-free per distinct value for [[DenseRankMode]]. The
  * scan itself holds O(1) rows, so reduce-side memory is
  * entirely the external sort's, which spills — no on-heap hash grouping
  * of unbounded key cardinality. (Only survivors are ever sorted: the
  * partial phase capped each map partition's contribution per key, so the
  * "sort-free over the raw input" property of the operator is intact.) */
case class GroupedTopKLimitFinalExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    rankAttr: Attribute,
    k: Int,
    mode: RankFunctionMode,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution:
      Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(partitionSpec) :: Nil

  /** Keys grouped (any ordering direction works — ascending by
    * convention), then the rank order within each key. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(e => SortOrder(e, Ascending)) ++ orderSpec)

  /** Forward the exchange's hash partitioning (this node only filters and
    * appends a column within partitions): without it the default
    * UnknownPartitioning would make a downstream aggregate/join on the
    * same keys insert a second, redundant shuffle of already-clustered
    * rows. */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val partSpec = partitionSpec
    val ordSpec = orderSpec
    val rank = rankAttr
    val rankMode = mode == RankMode
    val denseMode = mode == DenseRankMode

    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(partSpec, childOutput)
      val ord = new LazilyGeneratedOrdering(ordSpec, childOutput)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val outProj = UnsafeProjection.create(
        (childOutput :+ rank).zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        })
      new Iterator[InternalRow] {
        // partition keys are float-free (the rewrite refuses them), so
        // UnsafeRow byte equality == semantic key equality
        private var curKey: UnsafeRow = null
        private var pos = 0            // 0-based position within the key
        private var curRank = 1
        private var prev: UnsafeRow = null // previous row, rank-mode ties
        private var skipKey = false    // rank > k: rest of the key is dead
        private var pending: InternalRow = null

        private def advance(): Unit = {
          while (pending == null && rows.hasNext) {
            val row = rows.next().asInstanceOf[UnsafeRow]
            val key = keyProj(row)
            if (curKey == null || !key.equals(curKey)) {
              curKey = key.copy(); pos = 0; curRank = 1
              prev = null; skipKey = false
            }
            if (!skipKey) {
              if (rankMode) {
                if (prev != null && ord.compare(row, prev) != 0)
                  curRank = pos + 1
              } else if (denseMode) {
                if (prev != null && ord.compare(row, prev) != 0)
                  curRank += 1 // gap-free: next distinct value, next rank
              } else curRank = pos + 1
              if (curRank <= kk) {
                // ranks only grow along the run: once one row is dropped,
                // every later row of the key is too — stop copying/comparing
                if (rankMode || denseMode) prev = row.copy()
                rankRow.setInt(0, curRank)
                pending = outProj(joined(row, rankRow)).copy()
              } else skipKey = true
            }
            pos += 1
          }
        }

        def hasNext: Boolean = { if (pending == null) advance(); pending != null }
        def next(): InternalRow = {
          if (pending == null) advance()
          if (pending == null) throw new NoSuchElementException("next on empty iterator")
          val r = pending; pending = null; r
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
