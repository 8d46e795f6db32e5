package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

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
    * are dropped, like [[stratifiedHashSample]]'s unlisted strata. NULL
    * token counts count as zero tokens.
    *
    * Semantics: order each stratum by (hash60(key#salt), key) — the same
    * reproducible-identity order the rate samplers use — and keep rows
    * while the running token total stays ≤ budget. A strict prefix: the
    * first over-budget document ends the stratum (no skip-and-refill), so
    * membership is a pure function of (key set, salt, budgets), exactly
    * recomputable in SQL, and monotone in the budget (a bigger budget only
    * appends).
    *
    * Shape at scale: real mixes are dominated by one source (web is
    * routinely 80% of a corpus), so the textbook spelling — `SUM(tokens)
    * OVER (PARTITION BY stratum ORDER BY hash)` — funnels most of the
    * corpus through ONE task. This is instead the same two-phase
    * distributed scan [[Packing.packSequences]] uses, generalized to a
    * per-stratum prefix: range-partition by (stratum, hash, key) so each
    * stratum spans *contiguous* partitions sized by data volume, sum
    * tokens per (partition, stratum), prefix those sums on the driver
    * (P × |strata| longs — bounded), then stream each partition once
    * emitting the exact running total. The budget filter is then a pure
    * map. Parallelism scales with partitions, not strata. Emits
    * `cum_tokens` so downstream audits need no recompute. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
                        tokenCount: Column, budgets: Map[String, Long],
                        salt: String = "budget",
                        partitions: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "need at least one stratum budget")
    budgets.values.foreach(b =>
      require(b >= 0L, s"budget must be non-negative, got $b"))
    Seq("cum_tokens", "__h", "__t").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column (reserved by tokenBudgetSample)"))
    val spark = df.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val budgetCol = budgets.foldLeft(lit(-1L)) { case (acc, (stratum, b)) =>
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    val h = Hashing.hash60(
      concat(coalesce(col(keyCol).cast("string"), lit("null")),
        lit("#" + salt)))
    // unlisted strata are dropped up front (cheaper AND removes NULL
    // strata before the range exchange); the filter cannot change any
    // listed stratum's prefix because the scan is per stratum
    val sorted = df
      .where(budgetCol >= 0L)
      .withColumn("__h", h)
      .withColumn("__t", coalesce(tokenCount.cast("long"), lit(0L)))
      .repartitionByRange(p, col(strataCol), col("__h"), col(keyCol))
      .sortWithinPartitions(col(strataCol), col("__h"), col(keyCol))
      // eager materialization: phase 1 and phase 2 both read this; local
      // checkpoint blocks are freed by the ContextCleaner when the
      // returned frame is dropped (no caller unpersist contract)
      .localCheckpoint()
    val tokIdx = sorted.schema.fieldIndex("__t")
    val strIdx = sorted.schema.fieldIndex(strataCol)
    // phase 1: per-(partition, stratum) token sums — P × |strata| longs to
    // the driver, nothing else. Range partitioning makes each stratum a
    // contiguous partition run, but per-stratum keying needs no such
    // assumption: the driver prefix below is correct for any placement
    // because partition order ≡ sort order under repartitionByRange.
    val partSums: Array[(Int, Array[(AnyRef, Long)])] = sorted.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[AnyRef, Long]
        rows.foreach { r =>
          val g = r.get(strIdx).asInstanceOf[AnyRef]
          sums.update(g, sums.getOrElse(g, 0L) + r.getLong(tokIdx))
        }
        Iterator((pid, sums.toArray))
      }.collect()
    // driver prefix: offsets(pid)(stratum) = that stratum's tokens in all
    // earlier partitions
    val running = scala.collection.mutable.HashMap.empty[AnyRef, Long]
    val offsets: Map[Int, Map[AnyRef, Long]] =
      partSums.sortBy(_._1).map { case (pid, sums) =>
        val before = sums.map { case (g, s) =>
          val off = running.getOrElse(g, 0L)
          running.update(g, off + s)
          (g, off)
        }.toMap
        (pid, before)
      }.toMap
    // phase 2: one streaming pass per partition, seeded with its offsets.
    // __h/__t are the last two columns (withColumn appends), dropped here.
    val outSchema = StructType(
      sorted.schema.filterNot(f => f.name == "__h" || f.name == "__t"))
      .add("cum_tokens", LongType, nullable = false)
    val withCum = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
        val cum = scala.collection.mutable.HashMap.empty[AnyRef, Long]
        offsets.getOrElse(pid, Map.empty).foreach { case (g, o) =>
          cum.update(g, o)
        }
        rows.map { r =>
          val g = r.get(strIdx).asInstanceOf[AnyRef]
          val c = cum.getOrElse(g, 0L) + r.getLong(tokIdx)
          cum.update(g, c)
          Row.fromSeq(r.toSeq.dropRight(2) :+ c)
        }
      }, outSchema)
    withCum.where(col("cum_tokens") <= budgetCol)
  }
}
