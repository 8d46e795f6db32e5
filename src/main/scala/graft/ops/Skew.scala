package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation shapes. At 100 TB a handful of hot keys (one
  * mega-user, one viral document) can pin a whole stage on one reducer;
  * these operators restructure the aggregation so no single task ever sees
  * a full hot key.
  *
  * Plain algebraic aggregates (sum/count/min/max) don't need help — Spark's
  * HashAggregate already combines map-side, so each reducer receives one
  * partial row per (map task, key). The shapes that DO concentrate a key on
  * one task are the non-algebraic ones: `count(DISTINCT x)`, `collect_*`,
  * exact medians. Those are handled here.
  */
object Skew {

  /** Skew-safe `count(DISTINCT valueCol) GROUP BY keys`.
    *
    * `df.groupBy(keys).agg(countDistinct(v))` plans an Expand + two-phase
    * agg whose final phase still gathers every distinct (key, v) of a hot
    * key on one reducer *as state*. This shape dedupes on (keys, v) first —
    * the shuffle spreads a hot key across reducers by v's hash, each
    * reducer holds one group at a time — then counts rows per key, where
    * the input is already one row per distinct value (map-side combinable).
    * Two shuffles, both skew-free; constant memory per task.
    */
  def distinctCountByKey(df: DataFrame, keys: Seq[String], valueCol: String,
                         outCol: String = "n_distinct"): DataFrame = {
    // SQL distinct-count semantics: NULL is not a value and is not counted —
    // but a key whose values are all NULL still appears, with count 0
    // the aggregated side's keys are renamed __r_*: both sides share df's
    // lineage, and identically-named columns would make the join condition
    // an ambiguous self-join reference (Spark "repairs" it to a trivially
    // true predicate, with a warning per run)
    val counts = df.select(keys.map(col) :+ col(valueCol): _*)
      .where(col(valueCol).isNotNull)
      .groupBy(keys.map(col) :+ col(valueCol): _*).agg(lit(1).as("__one"))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as(outCol))
      .select(keys.map(k => col(k).as(s"__r_$k")) :+ col(outCol): _*)
    // null-safe (<=>) join back: groupBy treats NULL as a key value, so the
    // NULL-key group must re-match here too — a plain equi-join would
    // drop it to the coalesce(0) branch even when it has distinct values
    val keyRows = df.select(keys.map(col): _*).distinct()
    val cond = keys.map(k => keyRows(k) <=> counts(s"__r_$k")).reduce(_ && _)
    keyRows.join(counts, cond, "left")
      .select(keys.map(keyRows(_)) :+ coalesce(counts(outCol), lit(0L)).as(outCol): _*)
  }

  /** Salted two-phase sum: partial-aggregate under (keys, salt), then
    * combine per key. The salt comes from hashing `saltFrom` (a
    * high-cardinality column) so rows of one hot key spread over `salts`
    * reducers in phase 1; phase 2 merges `salts` rows per key — trivially
    * small. Equivalent to a plain grouped sum (summation is associative +
    * commutative; only the combine tree changes).
    *
    * Use when map-side partial aggregation is defeated — e.g. the rows of a
    * hot key arrive pre-shuffled by something else, or the aggregation
    * state per key is too large to sit in the map-side hash table.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                saltFrom: String, salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    df.withColumn("__salt", pmod(hash(col(saltFrom)), lit(salts)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg(sumCols.head match { case h => sum(h).as(s"__p_$h") },
        sumCols.tail.map(c => sum(c).as(s"__p_$c")): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(s"__p_${sumCols.head}").as(s"sum_${sumCols.head}"),
        sumCols.tail.map(c => sum(s"__p_$c").as(s"sum_$c")): _*)
  }

  /** Skew-safe equi-join by key salting — for when one join key is so hot
    * that a single reducer drowns (every web-crawl corpus has a
    * `source = "common_crawl"`; every orders table has its whale
    * customer). The big side's rows of a hot key are spread across
    * `factor` sub-keys by a deterministic salt drawn from `saltFrom` (any
    * column that varies WITHIN a key — a row id, a timestamp); the small
    * side is replicated `factor`× (explode over the salt range — small ×
    * factor rows, bounded because the small side is small by contract);
    * then one plain equi-join on (keys, salt). Result ≡ the unsalted
    * join, row for row: every big row meets every matching small row in
    * exactly one salt bucket. Deterministic — no `rand()`, so re-runs,
    * retried tasks, and the SQL oracle all see the same salt.
    *
    * This is the manual spelling of what AQE's skew-join split does at
    * runtime; it exists for the cases AQE can't touch: a skewed BROADCAST
    * candidate forced to shuffle by memory limits, pre-AQE engines, or a
    * key so hot a single post-split partition still spills. Broadcast the
    * small side instead whenever it fits — salting only beats broadcast
    * when the replicated small side must shuffle anyway. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Column, factor: Int,
                 salt: String = "skewjoin"): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    require(keys.nonEmpty, "need at least one join key")
    (big.columns ++ small.columns).find(_ == "__salt").foreach(_ =>
      throw new IllegalArgumentException(
        "input already has a '__salt' column (reserved by saltedJoin)"))
    val bigS = big.withColumn("__salt",
      pmod(graft.pipeline.Hashing.hash60(
        concat(coalesce(saltFrom.cast("string"), lit("null")),
          lit("#" + salt))), lit(factor.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
