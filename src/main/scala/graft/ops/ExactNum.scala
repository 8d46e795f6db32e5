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
    * `CAST(SUM(CAST(c AS DECIMAL(18,s))) AS DOUBLE)`. */
  def gridSum(c: Column, scale: Int = 6): Column =
    sum(dec(c, scale)).cast("double")
}
