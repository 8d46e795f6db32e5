package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextOps

/** Zipf power-law fit over the corpus rank–frequency curve — the
  * one-number datacard diagnostic for "does this corpus have a natural
  * token distribution" (real text fits `freq ∝ rank^s` with s ≈ −1;
  * boilerplate-heavy or templated corpora bend away from it).
  *
  * The fit is OLS of `ln freq` on `ln rank` over the vocabulary:
  *
  *  - token counts are ONE corpus aggregation (shuffle ∝ vocabulary,
  *    map-side combinable);
  *  - ranks come from the shared two-phase distributed prefix scan
  *    (`Sampling.topFractionPerStratum` at keep = 1/1) — ordered by
  *    `(count DESC, hash, token)`, never a single-task window, so the
  *    rank stage scales with partitions even at a 10⁸-type vocabulary;
  *  - both log coordinates are quantized ONCE to integer micro-units and
  *    the OLS moments are sums of long products widened to DECIMAL(38,0)
  *    — exact at any vocabulary size (a plain long Σx² overflows past
  *    ~10⁹ types), with no float addition order anywhere. Only the final
  *    Cramer division runs in doubles, identically on any engine. */
object Zipf {

  /** Returns one row: `(n_types, n_tokens, slope, intercept)` (unrounded;
    * log-micro-unit coordinate space). Empty corpora return n_types = 0
    * with NULL slope/intercept, a single-type corpus NULL slope (the
    * rank–frequency curve is a point). */
  def zipfFit(docs: DataFrame): DataFrame = {
    val freqs = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .withColumn("all", lit("all"))
    val ranked = Sampling.topFractionPerStratum(
      freqs, keyCol = "w", strataCol = "all", score = col("c"),
      keepNum = 1L, keepDen = 1L, salt = "zipf")
    val xU = floor(log(col("stratum_rank").cast("double")) * 1e6 + 0.5)
      .cast("long")
    val yU = floor(log(col("c").cast("double")) * 1e6 + 0.5).cast("long")
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val m = ranked.select(xU.as("x"), yU.as("y"), col("c"))
      .agg(count(lit(1)).as("n"), sum("c").as("n_tokens"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x") * col("x"))).as("sxx"),
        sum(dec(col("x") * col("y"))).as("sxy"))
    val n = col("n").cast("double")
    val (sx, sy, sxx, sxy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxx").cast("double"),
      col("sxy").cast("double"))
    val det = n * sxx - sx * sx
    val slope = when(det === 0.0, lit(null).cast("double"))
      .otherwise((n * sxy - sx * sy) / det)
    m.select(col("n").as("n_types"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        slope.as("slope"),
        when(col("n") === 0L, lit(null).cast("double"))
          .otherwise((sy - slope * sx) / n).as("intercept"))
  }
}
