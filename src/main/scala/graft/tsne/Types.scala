package graft.tsne

/** Core row types of the t-SNE dataflow (SURVEY.md §1, D1–D4).
  *
  * The reference (tsne-flink) models these as Flink Scala tuples over Breeze
  * vectors (`Tsne.scala:67,139`, `TsneHelpers.scala:198`); here they are plain
  * case classes encoded by Spark's `Encoders.product` so every field is a
  * first-class Catalyst column (ids stay relational, vectors are
  * `ArrayType(DoubleType)`).
  */

/** D1 — COO matrix entry: input coordinates or sparse distance/affinity
  * matrices. For input rows, `i` = point id, `j` = dimension index,
  * `v` = coordinate (ref: `Tsne.scala:141`). */
final case class CooEntry(i: Long, j: Int, v: Double)

/** D2 — a point or embedding row: id + dense vector
  * (ref: `Tsne.scala:139`). */
final case class Point(id: Long, vec: Array[Double])

/** kNN / sparse-matrix triple `(i, j, value)` with point ids on both sides
  * (ref output type of every kNN variant, `TsneHelpers.scala:43`). */
final case class Neighbor(i: Long, j: Long, dist: Double)

/** D3 — one sparse row pᵢ· of the affinity matrix, as parallel arrays of
  * active column ids and values (ref: `Tsne.scala:119-129` builds a Breeze
  * SparseVector; the fake n² capacity there is irrelevant — only the active
  * (j, v) pairs matter). */
final case class AffinityRow(id: Long, js: Array[Long], ps: Array[Double])

/** D4 — optimizer working-set row: embedding position + delta-bar-delta
  * state (ref: `TsneHelpers.scala:198-219`). */
final case class WorkingSet(
    id: Long,
    y: Array[Double],
    lastGrad: Array[Double],
    gains: Array[Double])

/** One neighbor reference of a working-set row in the state-distributed
  * optimizer path: the neighbor's original array position (`pos`, so the
  * join-reassembled row iterates in exactly the order the local kernel
  * iterates the `AffinityRow` arrays), its id, affinity, and — joined in
  * fresh each superstep — its current embedding position. */
final case class NeighborRef(pos: Int, j: Long, pj: Double, yj0: Double, yj1: Double)

/** A working-set row with its neighborhood re-assembled by the per-superstep
  * edges ⋈ state join (state-distributed path): sorted by `pos` so the
  * attractive-force summation order is identical to [[AffinityRow]]'s array
  * order. */
final case class StateNeighbors(
    id: Long, y: Array[Double], lastGrad: Array[Double], gains: Array[Double],
    ns: Array[NeighborRef])

/** [[Force]] plus the point's own optimizer state, carried through the
  * forces pass of the state-distributed path so the delta-bar-delta update
  * is a pure map (no second join, no driver round-trip) once the global
  * sumQ is known. */
final case class ForceState(
    id: Long, ax: Double, ay: Double, rx: Double, ry: Double, sumQPart: Double,
    lossPre: Double, pSum: Double,
    y: Array[Double], lastGrad: Array[Double], gains: Array[Double])

/** Per-point force row of one distributed optimizer superstep: attractive
  * (ax, ay), Barnes-Hut repulsive (rx, ry), this point's sumQ partial, and
  * — on loss supersteps only, else 0 — the sumQ-independent loss partials
  * `lossPre` = Σⱼ p·log(p/q) and `pSum` = Σⱼ p, which combine to the KL
  * loss as Σ lossPre + (Σ pSum)·log(sumQ) without a second pass over P
  * (ref gradient sub-steps c–e, `TsneHelpers.scala:258-308`; the reference
  * accumulates loss inside the same attractive-force map, `:297-300`).
  * Top-level so Spark's generated encoder code can access the class (a
  * `private` nested class breaks `SpecificSafeProjection` codegen). */
final case class Force(
    id: Long, ax: Double, ay: Double, rx: Double, ry: Double, sumQPart: Double,
    lossPre: Double, pSum: Double)
