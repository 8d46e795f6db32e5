package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution analytics over corpus-scale columns: the equi-depth
  * (equal-count) histogram and grouped least-squares trends — both in
  * engine-exact arithmetic (integer ranks / integer moment sums; any
  * float is a single IEEE op on identical operands cross-engine).
  */
object Analytics {

  /** Equi-depth histogram: `nBuckets` buckets holding equal row counts
    * (±1), boundaries reported as the actual min/max value per bucket —
    * the data-skipping / data-card complement to the fixed-width
    * [[graft.pipeline.Audit.histogram]], robust to heavy tails where
    * fixed-width bins collapse into one hot bin.
    *
    * Bucket assignment is `(rank - 1) · nBuckets / N` on the EXACT global
    * rank by `(value, hash60(key#salt), key)` from the terasort-style
    * two-phase prefix scan — range partitions + per-partition offsets,
    * never a one-task window, parallelism ∝ partitions. NULL values are
    * excluded (they have no rank). */
  def equiDepthHistogram(df: DataFrame, keyCol: String, valueCol: String,
                         nBuckets: Int, salt: String = "eqd"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val nonNull = df.where(col(valueCol).isNotNull)
      .withColumn("__all", lit("all"))
    val total = nonNull.count()
    if (total == 0L) {
      nonNull.select(lit(0L).as("bucket"), count(lit(1)).as("n"),
        min(valueCol).as("lo"), max(valueCol).as("hi")).where(lit(false))
    } else {
      val ranked = Sampling.stratumPrefixCum(nonNull, keyCol, "__all",
        lit(1L), sortByScore = Some(col(valueCol)), "__rank", salt,
        partitions = 0, scoreAscending = true)
      ranked
        // `div`, not `/`: Column./ is always DOUBLE division in Spark —
        // integer floor-div keeps the bucket id exact at any N
        .withColumn("bucket",
          expr(s"((__rank - 1) * $nBuckets) div ${total}L"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min(valueCol).as("lo"),
          max(valueCol).as("hi"))
    }
  }

  /** Per-group simple linear regression `y ~ x` in closed form from the
    * five integer moment sums (n, Σx, Σy, Σxy, Σx²) — one hash aggregate
    * with map-side partial combine, shuffle ∝ groups. Inputs MUST be
    * integer columns: the sums are then exact longs on both engines and
    * the slope/intercept are each a single IEEE division of identical
    * operands — bit-identical cross-engine. Groups with zero x-variance
    * report NULL slope/intercept. */
  def olsTrendPerGroup(df: DataFrame, groupCol: String, xCol: String,
                       yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    agg.select(col(groupCol), col("n"),
      when(den === 0L, lit(null)).otherwise(
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / den.cast("double"), 9)).as("slope_r"),
      when(den === 0L, lit(null)).otherwise(
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / den.cast("double"), 9)).as("intercept_r"))
  }
}
