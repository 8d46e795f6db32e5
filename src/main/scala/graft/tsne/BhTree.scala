package graft.tsne

/** Barnes-Hut quadtree (ref: `QuadTree.scala:28-152`, `Cell.scala:24-36`).
  *
  * Semantics replicated from the reference, 2-D only:
  *   - node capacity 1, running sum/center-of-mass per node
  *     (`QuadTree.scala:41-44,157`);
  *   - square cells everywhere — the reference's `subDivide` sets both child
  *     half-extents to `0.5 * hWidth` (`QuadTree.scala:80-81`) and the root
  *     is square (3-arg `Cell`, `TsneHelpers.scala:248`), so a single
  *     half-width suffices;
  *   - closed-interval containment with children probed in NW, NE, SW, SE
  *     order (`Cell.scala:31-36`, `QuadTree.scala:94-108`) — this fixes
  *     which child owns boundary points;
  *   - duplicate points accumulate mass in the leaf without subdividing
  *     (`QuadTree.scala:50-53`);
  *   - Barnes-Hut criterion `max(hH, hW) / D < θ` with **D = squared**
  *     distance to the center of mass, and the cell kernel always squared
  *     euclidean regardless of `--metric` (`QuadTree.scala:133-134` — a
  *     knowingly-replicated quirk, SURVEY.md §7); θ = 0 therefore forces
  *     full descent = exact repulsion;
  *   - a leaf holding exactly the query point contributes nothing
  *     (`QuadTree.scala:128`).
  *
  * The layout is array-packed (structure-of-arrays, int child pointers)
  * rather than the reference's object graph: cheap to build, compact to
  * Java-serialize into a broadcast, and traversed with an explicit stack so
  * deep trees can't overflow during (de)serialization or descent.
  */
final class BhTree private (rootX: Double, rootY: Double, rootHw: Double)
    extends Serializable {

  private var cap = 64
  private var cx = new Array[Double](cap)
  private var cy = new Array[Double](cap)
  private var hw = new Array[Double](cap)
  private var sumX = new Array[Double](cap)
  private var sumY = new Array[Double](cap)
  private var cnt = new Array[Int](cap)
  private var firstChild = new Array[Int](cap) // -1 = leaf; else 4 consecutive ids
  private var px = new Array[Double](cap)
  private var py = new Array[Double](cap)
  private var hasPoint = new Array[Boolean](cap)
  private var n = 0

  newNode(rootX, rootY, rootHw)

  /** Bounded subdivision depth: two distinct doubles separate within ~1074
    * halvings; past that (or for adversarially close points) the leaf just
    * keeps accumulating mass, which is also what the math wants. */
  private val MaxDepth = 256

  private def newNode(x: Double, y: Double, halfWidth: Double): Int = {
    if (n == cap) grow()
    cx(n) = x; cy(n) = y; hw(n) = halfWidth
    firstChild(n) = -1
    n += 1
    n - 1
  }

  private def grow(): Unit = {
    cap *= 2
    cx = java.util.Arrays.copyOf(cx, cap)
    cy = java.util.Arrays.copyOf(cy, cap)
    hw = java.util.Arrays.copyOf(hw, cap)
    sumX = java.util.Arrays.copyOf(sumX, cap)
    sumY = java.util.Arrays.copyOf(sumY, cap)
    cnt = java.util.Arrays.copyOf(cnt, cap)
    firstChild = java.util.Arrays.copyOf(firstChild, cap)
    px = java.util.Arrays.copyOf(px, cap)
    py = java.util.Arrays.copyOf(py, cap)
    hasPoint = java.util.Arrays.copyOf(hasPoint, cap)
  }

  private def contains(node: Int, x: Double, y: Double): Boolean =
    cx(node) - hw(node) <= x && cx(node) + hw(node) >= x &&
      cy(node) - hw(node) <= y && cy(node) + hw(node) >= y

  /** Child owning (x, y): probe in NW, NE, SW, SE order (reference order).
    * Containment can miss for a point lying in a 1-ulp gap between
    * FP-rounded child boundaries (child centers are cx±w, whose ±w edges
    * need not reproduce the parent's edges exactly); the reference silently
    * *drops* such points (`QuadTree.scala:109-113` returns false). Here the
    * total, gap-free quadrant sign test picks the nearest child instead, so
    * no mass is ever lost. Children are laid out NW, NE, SW, SE. */
  private def owningChild(node: Int, x: Double, y: Double): Int = {
    val c = firstChild(node)
    var k = 0
    while (k < 4) {
      if (contains(c + k, x, y)) return c + k
      k += 1
    }
    val east = if (x >= cx(node)) 1 else 0
    val south = if (y < cy(node)) 2 else 0
    c + east + south
  }

  private def subdivide(node: Int): Unit = {
    val w = 0.5 * hw(node)
    val x = cx(node); val y = cy(node)
    val c = newNode(x - w, y + w, w) // NW
    newNode(x + w, y + w, w)         // NE
    newNode(x - w, y - w, w)         // SW
    newNode(x + w, y - w, w)         // SE
    firstChild(node) = c
  }

  /** Insert a point; returns false iff outside the root cell (the
    * reference then drops it too, `QuadTree.scala:74-76`).
    *
    * One deliberate divergence from the reference: when a leaf that has
    * accumulated duplicate mass is subdivided, the resident moves down with
    * its FULL accumulated mass. The reference re-inserts `leafPoint` once
    * (`QuadTree.scala:59-61`), silently halving duplicates' weight in every
    * descendant cell — a mass-conservation bug a θ=0 traversal exposes.
    * Fixing it keeps the driver build and the merged distributed build
    * ([[mergeFrom]]) bit-identical in total mass per leaf. */
  def insert(x: Double, y: Double): Boolean = {
    if (!contains(0, x, y)) return false
    insertMass(x, y, 1, x, y)
    true
  }

  def size: Int = cnt(0)

  /** Root cell of this tree — two trees are mergeable iff these agree. */
  private[tsne] def rootCell: (Double, Double, Double) = (cx(0), cy(0), hw(0))

  /** Insert an aggregated mass packet: `mc` points all located at (x, y)
    * — or, past MaxDepth, a mixed-mass packet represented by (x, y) —
    * carrying exact coordinate sums (msx, msy). [[insert]] is the
    * special case (mc=1, msx=x, msy=y); this generalization is what makes
    * subtree *merging* possible: a leaf of another tree moves wholesale,
    * duplicates' mass included, without replaying its individual inserts. */
  private def insertMass(x: Double, y: Double, mc: Int, msx: Double, msy: Double): Unit = {
    var node = 0
    var depth = 0
    while (true) {
      sumX(node) += msx; sumY(node) += msy; cnt(node) += mc
      if (firstChild(node) == -1) {
        if (!hasPoint(node)) {
          px(node) = x; py(node) = y; hasPoint(node) = true
          return
        } else if (px(node) == x && py(node) == y) {
          return // same location: mass only, like insert's duplicate case
        } else if (depth >= MaxDepth) {
          return // pathological closeness: keep mass, keep resident
        } else {
          // resident moves down one level with ALL its accumulated mass
          // (this node's totals minus the incoming packet)
          val rc = cnt(node) - mc
          val rsx = sumX(node) - msx
          val rsy = sumY(node) - msy
          val ox = px(node); val oy = py(node)
          subdivide(node)
          hasPoint(node) = false
          val ochild = owningChild(node, ox, oy)
          sumX(ochild) += rsx; sumY(ochild) += rsy; cnt(ochild) += rc
          px(ochild) = ox; py(ochild) = oy; hasPoint(ochild) = true
          node = owningChild(node, x, y)
          depth += 1
        }
      } else {
        node = owningChild(node, x, y)
        depth += 1
      }
    }
  }

  /** Merge another tree (built with the *same root cell*) into this one by
    * moving each of its occupied leaves wholesale via [[insertMass]] —
    * internal-node sums/counts rebuild along the insertion paths. Cost
    * O(leaves(other) · depth). Associative up to floating-point summation
    * order in the center-of-mass accumulators (cnt is exact; a θ=0
    * traversal of the merged tree is therefore bit-exact). */
  private[tsne] def mergeFrom(other: BhTree): BhTree = {
    require(cx(0) == other.cx(0) && cy(0) == other.cy(0) && hw(0) == other.hw(0),
      "cannot merge quadtrees with different root cells")
    var i = 0
    while (i < other.n) {
      if (other.firstChild(i) == -1 && other.cnt(i) > 0)
        insertMass(other.px(i), other.py(i), other.cnt(i),
          other.sumX(i), other.sumY(i))
      i += 1
    }
    this
  }

  /** Barnes-Hut traversal (ref `QuadTree.scala:123-152`): returns
    * (Fx, Fy, sumQ-partial) for one query point. */
  def repulsiveForce(x: Double, y: Double, theta: Double): (Double, Double, Double) = {
    var fx = 0.0; var fy = 0.0; var sumQ = 0.0
    var stack = new Array[Int](64)
    var top = 0
    stack(top) = 0; top += 1
    while (top > 0) {
      top -= 1
      val node = stack(top)
      val leaf = firstChild(node) == -1
      if (leaf && cnt(node) == 0) {
        // empty leaf: nothing
      } else if (leaf && hasPoint(node) && px(node) == x && py(node) == y) {
        // the query point's own leaf: skipped entirely (duplicates included,
        // matching the reference's equality test on the stored point)
      } else {
        val comX = sumX(node) / cnt(node)
        val comY = sumY(node) / cnt(node)
        val dx = x - comX; val dy = y - comY
        val d = dx * dx + dy * dy
        if (leaf || hw(node) / d < theta) {
          val q = 1.0 / (1.0 + d)
          val mult = cnt(node) * q
          sumQ += mult
          fx += mult * q * dx
          fy += mult * q * dy
        } else {
          if (top + 4 > stack.length) stack = java.util.Arrays.copyOf(stack, stack.length * 2)
          val c = firstChild(node)
          stack(top) = c; stack(top + 1) = c + 1
          stack(top + 2) = c + 2; stack(top + 3) = c + 3
          top += 4
        }
      }
    }
    (fx, fy, sumQ)
  }
}

object BhTree {

  /** The root-cell rule shared by every build path (`TsneHelpers.scala:
    * 228-231`): centered on the mean, half-width `max(xspan, yspan)`.
    * One definition so the driver build, the executor build, and the
    * optimizer's precomputed-cell fast path cannot drift apart (mergeFrom
    * requires exactly equal root cells). */
  private[tsne] def rootCellOf(points: Iterable[Array[Double]]): (Double, Double, Double) = {
    var minX = Double.PositiveInfinity; var maxX = Double.NegativeInfinity
    var minY = Double.PositiveInfinity; var maxY = Double.NegativeInfinity
    var sx = 0.0; var sy = 0.0; var c = 0
    points.foreach { p =>
      if (p(0) < minX) minX = p(0)
      if (p(0) > maxX) maxX = p(0)
      if (p(1) < minY) minY = p(1)
      if (p(1) > maxY) maxY = p(1)
      sx += p(0); sy += p(1); c += 1
    }
    require(c > 0, "cannot build a quadtree from zero points")
    (sx / c, sy / c, math.max(maxX - minX, maxY - minY))
  }

  /** Build a tree the way the reference's gradient does
    * (`TsneHelpers.scala:228-256`): root from [[rootCellOf]], then insert
    * every point. */
  def build(points: Iterable[Array[Double]]): BhTree = {
    val (cx, cy, hw) = rootCellOf(points)
    val t = new BhTree(cx, cy, hw)
    points.foreach(p => t.insert(p(0), p(1)))
    t
  }

  /** Driver-free distributed build: one pass for the root cell (mean +
    * span, like the reference's bounds+mean aggregate,
    * `TsneHelpers.scala:228-231`), then per-partition subtrees over the
    * *same* root cell merged pairwise with `treeAggregate` — the
    * scale-safe alternative to collecting all N points and building on
    * the driver (ref builds via a global parallelism-1 reduceGroup,
    * `TsneHelpers.scala:234-256`). The merged tree's structure and masses
    * match the driver build exactly; center-of-mass sums differ only in
    * floating-point summation order, so θ=0 traversals are bit-exact and
    * θ>0 traversals agree to ~1e-12 (`BhTreeSpec`). */
  def buildRdd(points: org.apache.spark.rdd.RDD[(Double, Double)],
               depth: Int = 2): BhTree = {
    val (minX, maxX, minY, maxY, sx, sy, c) = points.treeAggregate(
      (Double.PositiveInfinity, Double.NegativeInfinity,
        Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0.0, 0L))(
      seqOp = { case ((nx, xx, ny, xy, ax, ay, k), (x, y)) =>
        (math.min(nx, x), math.max(xx, x), math.min(ny, y), math.max(xy, y),
          ax + x, ay + y, k + 1)
      },
      combOp = { case ((nx1, xx1, ny1, xy1, ax1, ay1, k1),
                       (nx2, xx2, ny2, xy2, ax2, ay2, k2)) =>
        (math.min(nx1, nx2), math.max(xx1, xx2), math.min(ny1, ny2),
          math.max(xy1, xy2), ax1 + ax2, ay1 + ay2, k1 + k2)
      }, depth)
    require(c > 0, "cannot build a quadtree from zero points")
    buildRdd(points, sx / c, sy / c, math.max(maxX - minX, maxY - minY), depth)
  }

  /** [[buildRdd]] with a caller-supplied root cell — for callers that
    * already hold every point (the optimizer superstep collects the working
    * set for its broadcast state anyway) and can derive the cell in one
    * O(N) driver pass instead of paying a distributed stats job. */
  def buildRdd(points: org.apache.spark.rdd.RDD[(Double, Double)],
               rootX: Double, rootY: Double, rootHw: Double,
               depth: Int): BhTree = {
    val zero = new BhTree(rootX, rootY, rootHw)
    points.treeAggregate(zero)(
      seqOp = (t, p) => { t.insert(p._1, p._2); t },
      combOp = (a, b) => a.mergeFrom(b),
      depth)
  }
}
