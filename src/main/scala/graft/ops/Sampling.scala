package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.Hashing

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from a partition-seeded RNG: the selected set changes
  * with partitioning, engine, and re-runs — useless for reproducible corpus
  * construction, holdout splits, or cross-engine verification. Hash
  * sampling decides membership per *row identity*: a row is in the sample
  * iff `h(key, salt) < rate · 2⁶⁰`, with [[Hashing.hash60]] (md5-60bit) as
  * `h`. Properties a 100 TB curation pipeline needs:
  *
  *   - reproducible: same (key, salt, rate) → same sample, on any engine,
  *     any partitioning, any day — and exactly recomputable in SQL;
  *   - monotone: raising the rate only *adds* rows (nested samples), so a
  *     1% dev slice is a subset of the 10% training slice by construction;
  *   - streaming/join-safe: membership is a pure map-side predicate — no
  *     shuffle, no state, pushes past joins on the key;
  *   - splittable: disjoint salts give independent samples (holdout vs
  *     train never overlap by accident).
  */
object Sampling {

  /** Membership predicate: `hash60(key # salt) < rate · 2⁶⁰`. NULL keys
    * hash the literal string "null" rather than propagating SQL NULL — a
    * NULL predicate silently drops the row from EVERY sample (a "100%
    * sample" that isn't the dataset); hashing a sentinel keeps NULL-key
    * rows sampled at the same rate, deterministically, on both engines
    * (`COALESCE(CAST(k AS VARCHAR), 'null')` on the oracle side). */
  def hashSamplePredicate(key: Column, rate: Double, salt: String): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0, 1], got $rate")
    // 2^60 fits a signed long; the threshold is exact for rate = 0 and 1
    val threshold = math.round(rate * (1L << 60).toDouble)
    Hashing.hash60(concat(coalesce(key.cast("string"), lit("null")),
      lit("#" + salt))) < lit(threshold)
  }

  /** Uniform deterministic sample at `rate` keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "sample"): DataFrame =
    df.where(hashSamplePredicate(col(keyCol), rate, salt))

  /** Stratified deterministic sample: per-stratum rates (e.g. per-language
    * mixing weights), rows of unlisted strata are dropped. The threshold
    * lookup is a literal CASE expression over *precomputed integer*
    * thresholds — float-to-int conversion happens once here, not per row
    * per engine (Spark truncates double→long where DuckDB rounds, so a
    * runtime `rate · 2⁶⁰` cast would disagree across the oracle boundary
    * for rates with an inexact binary expansion). Still a pure map-side
    * predicate. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           salt: String = "sample"): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    rates.values.foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0, 1], got $r"))
    val thresholdCol = rates.foldLeft(lit(-1L)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum,
        lit(math.round(r * (1L << 60).toDouble))).otherwise(acc)
    }
    df.where(Hashing.hash60(
      concat(coalesce(col(keyCol).cast("string"), lit("null")),
        lit("#" + salt))) < thresholdCol)
  }

  /** Token-budget mixture sampling: per stratum (source/domain), keep the
    * deterministic hash-ordered PREFIX of documents whose cumulative token
    * count fits the stratum's budget — how a training mix is actually
    * specified ("30B tokens of web, 5B of code"), where per-document rate
    * sampling can only target expected token mass. Strata without a budget
    * are dropped, like [[stratifiedHashSample]]'s unlisted strata.
    *
    * Semantics: order each stratum by (hash60(key#salt), key) — the same
    * reproducible-identity order the rate samplers use — and keep rows
    * while the running token total stays ≤ budget. A strict prefix: the
    * first over-budget document ends the stratum (no skip-and-refill), so
    * membership is a pure function of (key set, salt, budgets), exactly
    * recomputable in SQL, and monotone in the budget (a bigger budget only
    * appends).
    *
    * Shape at scale: one ranged window per stratum — a hash shuffle on the
    * stratum key, then a sort per stratum partition. The per-stratum sort
    * is inherent to exact-prefix semantics (a budget is a sequential
    * constraint); strata are the parallel unit, matching how mixes are
    * defined. Emits `cum_tokens` so downstream audits need no recompute. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
                        tokenCount: Column, budgets: Map[String, Long],
                        salt: String = "budget"): DataFrame = {
    require(budgets.nonEmpty, "need at least one stratum budget")
    budgets.values.foreach(b =>
      require(b >= 0L, s"budget must be non-negative, got $b"))
    require(!df.columns.contains("cum_tokens"),
      "input already has a cum_tokens column (the operator appends it)")
    val budgetCol = budgets.foldLeft(lit(-1L)) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val h = Hashing.hash60(
      concat(coalesce(col(keyCol).cast("string"), lit("null")),
        lit("#" + salt)))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(h.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokenCount).over(w))
      .where(col("cum_tokens") <= budgetCol)
  }
}
