package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stratum score normalization — the feature-conditioning step between
  * raw quality signals and threshold-based curation (a length cutoff that
  * is right for English is wrong for Chinese; normalizing per language
  * makes one downstream threshold meaningful everywhere).
  *
  * Both operators are engine-exact by construction: the winsorize cutoffs
  * are ACTUAL data values picked by exact nearest-rank (never an
  * interpolated float), and the min-max scale is two IEEE subtractions and
  * one division on identical operands — so oracle comparison needs no
  * tolerance beyond output rounding.
  */
object Normalize {

  /** Winsorize `valueCol` within each stratum: clamp to the exact
    * nearest-rank [`loQ`, `hiQ`] quantile values (fractions as rationals,
    * e.g. (1, 20) = p05). Cutoffs come from
    * [[Sketches.exactQuantilesPerStratum]] — the two-phase distributed
    * prefix scan — and ride back as a BROADCAST of 2 rows per stratum, so
    * the clamp itself is map-side; no stratum is ever sorted in one task.
    * NULL values stay NULL (they are excluded from ranking and must not
    * clamp to the low cutoff); strata absent from the cutoff table (all
    * NULL) pass through unchanged. */
  def winsorizePerStratum(df: DataFrame, keyCol: String, strataCol: String,
                          valueCol: String, loQ: (Long, Long),
                          hiQ: (Long, Long),
                          salt: String = "wins"): DataFrame = {
    // the input feeds THREE scans (stratum counts, the ranked pass, the
    // clamp join's left side) — materialize so an expensive derived
    // valueCol (e.g. a tokenizing quality score) is computed once, not
    // three times. localCheckpoint, not persist: the returned plan is
    // lazy so this function has no post-action hook to unpersist, and
    // CacheManager-pinned blocks would accumulate across a long session;
    // checkpoint blocks are freed by the ContextCleaner once the RDD is
    // unreachable.
    val cached = df.localCheckpoint()
    val cuts = Sketches.exactQuantilesPerStratum(cached, keyCol, strataCol,
      valueCol, Map("lo" -> loQ, "hi" -> hiQ), salt)
    val wide = cuts.groupBy(col(strataCol))
      .agg(max(when(col("quantile") === "lo", col(valueCol))).as("__lo"),
        max(when(col("quantile") === "hi", col(valueCol))).as("__hi"))
    cached.join(broadcast(wide), Seq(strataCol), "left")
      .withColumn(s"${valueCol}_winsor",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Min-max scale `valueCol` to [0, 1] within each stratum:
    * `(v - min) / (max - min)`, with a degenerate stratum (min = max)
    * mapping to 0.0. Per-stratum extrema are one hash aggregate broadcast
    * back — the scale itself is map-side. NULL values stay NULL. */
  def minMaxScalePerStratum(df: DataFrame, strataCol: String,
                            valueCol: String): DataFrame = {
    val stats = df.groupBy(col(strataCol))
      .agg(min(valueCol).as("__mn"), max(valueCol).as("__mx"))
    df.join(broadcast(stats), Seq(strataCol), "left")
      .withColumn(s"${valueCol}_scaled",
        when(col(valueCol).isNull, lit(null))
          .when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col(valueCol) - col("__mn")) /
            (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** Percentile-rank normalization within each stratum: every row gets
    * `stratum_rank` (1-based, ascending by `score` with the deterministic
    * (hash, key) tie order) and `pct_rank = rank / |stratum|` — the
    * calibration transform that makes quality scores comparable ACROSS
    * sources before a global gate ("keep the best 20% overall" must not
    * let one source's score scale dominate). Ranks come from the shared
    * two-phase distributed prefix scan — no stratum is ever sorted in one
    * task — and counts broadcast back, so the division is map-side. The
    * rank is an exact integer; `pct_rank` is one IEEE division,
    * engine-exact. */
  def percentileRankPerStratum(df: DataFrame, keyCol: String,
                               strataCol: String,
                               score: org.apache.spark.sql.Column,
                               salt: String = "pctr",
                               partitions: Int = 0): DataFrame = {
    // the input feeds the counts scan + the ranked pass (itself two
    // evaluations: range sampling, sort) — same materialize-once
    // discipline as winsorizePerStratum
    val cached = df.localCheckpoint()
    val ranked = Sampling.stratumPrefixCum(cached, keyCol, strataCol, lit(1L),
      sortByScore = Some(score), "stratum_rank", salt, partitions,
      scoreAscending = true)
    val counts = cached.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), Seq(strataCol))
      .withColumn("pct_rank",
        col("stratum_rank").cast("double") / col("__n").cast("double"))
      .drop("__n")
  }

  /** Quantile normalization across strata — the microarray/ML "quantile
    * matching" transform: each row's value is REPLACED by the global
    * distribution's value at the same relative rank, so every stratum's
    * marginal becomes the corpus marginal exactly and one downstream
    * threshold means the same thing in every source. Stronger than
    * [[percentileRankPerStratum]] (which emits the rank itself): the
    * output stays in value units, so length/score cutoffs tuned on the
    * whole corpus apply per source unchanged.
    *
    * Mapping is pure integer: stratum rank r ∈ [1, nₛ] (ascending by
    * value with the deterministic (value, hash, key) tie order) maps to
    * global rank ⌈r·N/nₛ⌉ — computed as `(r·N + nₛ − 1) div nₛ` with the
    * multiply widened to decimal(38,0) (r·N overflows a long at
    * crawl-scale row counts; integral `div` on decimals still returns
    * LONG, truncation identical to DuckDB `//` on HUGEINT) — then one
    * co-partitioned equi-join fetches the global value at that rank.
    * For an integer value column the whole operator is engine-exact with
    * zero float ops.
    *
    * Shape at scale: two runs of the shared two-phase prefix scan (per
    * stratum, and globally as a single range-partitioned scan — never a
    * one-task window), one |strata|-row broadcast of counts, and one
    * slim rank-keyed equi-join ∝ N. */
  def quantileNormalizePerStratum(df: DataFrame, keyCol: String,
                                  strataCol: String, valueCol: String,
                                  salt: String = "qn",
                                  partitions: Int = 0): DataFrame = {
    // feeds the stratum scan, the global scan, and the counts — cut once
    val cached = df.localCheckpoint()
    val total = cached.count()
    require(total > 0, "quantileNormalizePerStratum needs a non-empty input")
    val ranked = Sampling.stratumPrefixCum(cached, keyCol, strataCol,
      lit(1L), sortByScore = Some(col(valueCol)), "__rs", salt, partitions,
      scoreAscending = true)
    val counts = cached.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns"))
    // the reference distribution: the same deterministic order over ONE
    // constant stratum — still the two-phase scan, no single-task sort
    val globalRanked = Sampling.stratumPrefixCum(
      cached.withColumn("__g", lit(1)), keyCol, "__g",
      lit(1L), sortByScore = Some(col(valueCol)), "__gr", salt, partitions,
      scoreAscending = true)
      .select(col("__gr"), col(valueCol).as(s"${valueCol}_norm"))
    ranked.join(broadcast(counts), Seq(strataCol))
      .withColumn("__target",
        call_function("div",
          col("__rs").cast("decimal(38,0)") * lit(total) + col("__ns") -
            lit(1L),
          col("__ns")))
      .join(globalRanked, col("__target") === col("__gr"))
      .drop("__ns", "__gr", "__target")
      .withColumnRenamed("__rs", "stratum_rank")
  }
}
