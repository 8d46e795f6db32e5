package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent EXACT summation of grid-valued DOUBLE columns.
  *
  * A plain `sum(double)` folds partial aggregates in partition order,
  * which is nondeterministic across runs and differs from the oracle
  * engine's own fold order; for a group of n rows the accumulated error
  * is ~√n·ε·|Σ|, which at sf1-scale groups (10⁶ rows, sums ~10⁸)
  * exceeds the distance from a grid-valued true sum to the nearest
  * `round(·, 6)` boundary — so the rounded output can flake under
  * repartitioning. The fixture's money/value columns all live on a
  * ≤6-decimal grid (checked: `value`, `l_quantity`, `l_extendedprice`,
  * `l_discount`, `l_tax` are 2-decimal), so casting to DECIMAL first
  * makes every partial sum exact and associative: the result is one
  * canonical number whatever the partitioning, and the oracle recomputes
  * it bit-identically with the same `CAST(x AS DECIMAL(18,s))` spelling.
  *
  * Spark widens `sum(decimal(18,s))` to `decimal(28,s)` (+10 digits of
  * headroom) and DuckDB to `decimal(38,s)`, so a 100 TB-scale sum of
  * 2-decimal money does not overflow. The final cast back to DOUBLE is
  * deterministic (round-to-nearest of an exact decimal) on both engines.
  */
object ExactNum {

  /** `c` reinterpreted on its decimal grid — exact for any double whose
    * value is a multiple of 10^-scale within decimal(18, scale) range. */
  def dec(c: Column, scale: Int = 6): Column =
    c.cast(s"decimal(18,$scale)")

  /** Exact order-independent sum of a grid-valued double column,
    * returned as DOUBLE (deterministic nearest-double of the exact
    * decimal sum). Mirror in DuckDB as
    * `CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)`.
    *
    * Prefer [[gridSumFast]] for plain sums on hot full-scan aggregates;
    * keep this decimal spelling where the summand is a PRODUCT (decimal
    * multiply widens exactly, a pre-scaled long product can overflow —
    * e.g. value·Δt in micros) or where the scaled sum could exceed a
    * long. */
  def gridSum(c: Column, scale: Int = 6): Column =
    sum(dec(c, scale)).cast("double")

  /** `c` scaled to exact integer grid units: floor(c·10^s + 0.5) as
    * LONG. Multiply, add and floor are each one IEEE op on identical
    * operands, so the long is bit-identical cross-engine (and an
    * explicit floor, because double→long CAST truncates in Spark but
    * rounds in DuckDB). */
  def gridLong(c: Column, scale: Int = 6): Column =
    floor(c * lit(math.pow(10.0, scale)) + lit(0.5)).cast("long")

  /** The FAST spelling of [[gridSum]]: sum exact long grid units, divide
    * once at the end. A long hash-aggregate stays in primitive codegen —
    * measured round 9: the decimal spelling cost ~2.5× on the full-scan
    * lineitem aggregates — at the price of an overflow bound: use only
    * when |Σ c·10^s| < 2^63 ≈ 9.2e18 (2-decimal money at 100 TB row
    * counts stays inside; micro-scaled products do NOT — see
    * [[gridSum]]). Mirror in DuckDB as
    * `SUM(CAST(FLOOR(c * 10^s + 0.5) AS BIGINT)) / 10^s.0`. */
  def gridSumFast(c: Column, scale: Int = 6): Column =
    sum(gridLong(c, scale)) / lit(math.pow(10.0, scale))
}
