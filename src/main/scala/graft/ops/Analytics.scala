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

  /** EXACT two-sample Kolmogorov–Smirnov drift per stratum, one-vs-rest:
    * for each stratum g, `D_g = max_x |F_g(x) − F_¬g(x)|` between the
    * stratum's empirical value CDF and the rest of the corpus — the
    * nonparametric "did this source/snapshot drift" alarm that needs no
    * binning choice (the failure mode of histogram/KL monitors: drift
    * inside one bin is invisible; KS sees any CDF gap ≥ 1/n).
    *
    * Arithmetic is integer-exact end-to-end: the statistic is kept as the
    * integer numerator `max |c_in·n_out − c_out·n_in|` over the common
    * refinement of both CDFs (all products < 2⁶² for n < 2³¹, enforced),
    * and `ks_r = ks_num / (n_in·n_out)` is the one IEEE division. No
    * sort-in-one-task anywhere: BOTH cumulative counts ride one shared
    * two-phase prefix scan ([[Sampling.stratumPrefixCum]]) with the pair
    * packed into a single long (in-count in the high 32 bits), so the
    * whole monitor is one range-partitioned scan + two hash aggregations.
    * Cost is ∝ |strata| · N rows (each row joins every stratum's
    * one-vs-rest split via a broadcast fan-out) — the monitor shape, run
    * over a handful of sources/snapshots, not thousands.
    *
    * Emits `(strataCol, n_in, n_out, ks_num, ks_r)`; NULL values are
    * excluded (no rank), a stratum covering the whole input gets ks = 0. */
  def ksDriftPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                        valueCol: String, salt: String = "ks",
                        partitions: Int = 0): DataFrame = {
    val nonNull = df.where(col(valueCol).isNotNull)
      .select(col(keyCol), col(strataCol), col(valueCol))
    // one column-pruned count guards the 32-bit count packing (each side's
    // cumulative count must fit its half of the packed long)
    require(nonNull.count() < Int.MaxValue.toLong,
      "KS packing supports inputs up to 2^31 rows")
    val strata = nonNull.select(col(strataCol).as("__stratum")).distinct()
    val fanned = nonNull.crossJoin(broadcast(strata))
    val w = when(col(strataCol) === col("__stratum"), lit(1L << 32))
      .otherwise(lit(1L))
    val cum = Sampling.stratumPrefixCum(
      fanned, keyCol, "__stratum", w,
      sortByScore = Some(col(valueCol)), "__cum", salt, partitions,
      scoreAscending = true)
    // F at each distinct value = the largest inclusive cum among its ties
    val perValue = cum.groupBy(col("__stratum"), col(valueCol))
      .agg(max("__cum").as("__c"))
      .select(col("__stratum"),
        shiftright(col("__c"), 32).as("__cin"),
        col("__c").bitwiseAND(lit(0xFFFFFFFFL)).as("__cout"))
    val sizes = perValue.groupBy("__stratum")
      .agg(max("__cin").as("n_in"), max("__cout").as("n_out"))
    perValue.join(broadcast(sizes), "__stratum")
      .groupBy(col("__stratum"), col("n_in"), col("n_out"))
      .agg(max(abs(col("__cin") * col("n_out") - col("__cout") * col("n_in")))
        .as("ks_num"))
      .select(col("__stratum").as(strataCol), col("n_in"), col("n_out"),
        col("ks_num"),
        when(col("n_out") > 0,
          round(col("ks_num").cast("double") /
            (col("n_in") * col("n_out")).cast("double"), 6) + lit(0.0))
          .otherwise(lit(0.0)).as("ks_r"))
  }
}
