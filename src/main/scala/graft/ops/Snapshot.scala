package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot maintenance for incrementally re-crawled corpora: diff two
  * corpus snapshots into a changeset, and apply a changeset back onto a
  * snapshot. Together they are the CDC primitive an incremental 100 TB
  * pipeline runs instead of reprocessing the world: downstream stages
  * (dedup, quality, packing) recompute over `diff` output only, and the
  * served corpus advances by `applyChanges` — one keyed join each, never
  * a full-corpus rewrite of unchanged rows.
  *
  * The reference engine has no incremental surface (its pipeline is
  * one-shot: `Tsne.scala` reads a complete input per run); this module is
  * a rebuild extension in the same family as `Dedup.exactIncremental` /
  * `minHashIncremental` (incremental dedup), completing the
  * snapshot-in/snapshot-out loop around them.
  */
object Snapshot {

  /** Classify every key present in either snapshot:
    *
    *  - `insert` — key only in `newDf`
    *  - `delete` — key only in `oldDf`
    *  - `update` — key in both, any of `cols` differs (null-safe compare:
    *    NULL→value and value→NULL are updates, NULL→NULL is not)
    *
    * Unchanged rows are dropped — the whole point is that downstream work
    * is proportional to |changes|, not |corpus|. Column values in the
    * output are the NEW side for insert/update and the OLD side for
    * delete (the row a consumer must add/replace/retire).
    *
    * Shape: ONE hash-partitioned full outer join on `key`; the change
    * classification is a map-side projection over the joined row. Columns
    * are compared directly with null-safe equality rather than via a
    * content hash — same shuffle either way (the join moves the full row
    * regardless), and direct comparison cannot be fooled by a hash
    * collision into dropping a real update. */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String,
           cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one compared column")
    val o = oldDf.select((key +: cols).map(c => col(c).as("_old_" + c)): _*)
    val n = newDf.select((key +: cols).map(c => col(c).as("_new_" + c)): _*)
    val joined = o.join(n, col("_old_" + key) === col("_new_" + key), "full_outer")
    val changed: Column = cols
      .map(c => !(col("_old_" + c) <=> col("_new_" + c)))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("_old_" + key).isNull, lit("insert"))
          .when(col("_new_" + key).isNull, lit("delete"))
          .when(changed, lit("update")))
      .where(col("change").isNotNull)
      .select(
        coalesce(col("_new_" + key), col("_old_" + key)).as(key) +:
          col("change") +:
          cols.map(c => coalesce(col("_new_" + c), col("_old_" + c)).as(c)): _*)
  }

  /** [[diff]] with the OLD column values preserved alongside the new
    * (`old_<c>` columns, NULL for inserts): the changeset shape
    * incremental-view maintenance needs — an update that moves a row
    * across groups must subtract from its OLD group, which the coalesced
    * [[diff]] output cannot express. */
  def diffWithOld(oldDf: DataFrame, newDf: DataFrame, key: String,
                  cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one compared column")
    val o = oldDf.select((key +: cols).map(c => col(c).as("_old_" + c)): _*)
    val n = newDf.select((key +: cols).map(c => col(c).as("_new_" + c)): _*)
    val joined = o.join(n, col("_old_" + key) === col("_new_" + key), "full_outer")
    val changed: Column = cols
      .map(c => !(col("_old_" + c) <=> col("_new_" + c)))
      .reduce(_ || _)
    joined
      .withColumn("change",
        when(col("_old_" + key).isNull, lit("insert"))
          .when(col("_new_" + key).isNull, lit("delete"))
          .when(changed, lit("update")))
      .where(col("change").isNotNull)
      .select(
        coalesce(col("_new_" + key), col("_old_" + key)).as(key) +:
          col("change") +:
          (cols.map(c => col("_new_" + c).as(c)) ++
            cols.map(c => col("_old_" + c).as("old_" + c))): _*)
  }

  /** Incremental view maintenance for per-group `COUNT(*)` + `SUM(value)`
    * aggregates: refresh `baseAgg` (columns `groupCols :+ n :+ s`) from a
    * [[diffWithOld]] changeset WITHOUT rescanning the corpus — the
    * pattern that keeps a 100 TB datacard current at changeset cost.
    * Count and sum are abelian: deletes/update-olds contribute
    * (−1, −old value) to their OLD group, inserts/update-news (+1, +new
    * value) to their NEW group; the per-group deltas (∝ |changes|, tiny)
    * full-outer-join onto the base aggregate, creating new groups and
    * dropping emptied ones. Group columns must be non-NULL (a NULL group
    * key would not match itself across the using-join).
    *
    * `SnapshotSpec` pins the identity: incremental refresh ≡ the direct
    * aggregate over the new corpus, including cross-group moves. */
  def incrementalCountSum(baseAgg: DataFrame, changes: DataFrame,
                          groupCols: Seq[String],
                          valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val minus = changes.where(col("change").isin("delete", "update"))
      .select(groupCols.map(c => col("old_" + c).as(c)) ++
        Seq(lit(-1L).as("__dn"),
          (-col("old_" + valueCol).cast("long")).as("__ds")): _*)
    val plus = changes.where(col("change").isin("insert", "update"))
      .select(groupCols.map(col) ++
        Seq(lit(1L).as("__dn"), col(valueCol).cast("long").as("__ds")): _*)
    val delta = minus.unionByName(plus)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("__dn").as("__dn"), sum("__ds").as("__ds"))
    baseAgg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("__ds"), lit(0L))).as("s")): _*)
      .where(col("n") > 0)
  }

  /** Apply a changeset (rows shaped like [[diff]] output: `key`, `change`
    * ∈ insert|update|delete, payload columns) onto a snapshot:
    * delete/update keys leave, insert/update rows enter. The result is
    * exactly `diff(snapshot, result, ...) ≡ changes` for a well-formed
    * changeset (SnapshotSpec pins the round-trip).
    *
    * Shape: one anti-join on `key` plus a union — and a changeset is
    * small relative to its corpus by construction, so the anti-join's
    * change side broadcasts: the 100 TB snapshot is never shuffled, each
    * task drops its own superseded rows map-locally. Malformed change
    * values fail loudly rather than silently passing rows through. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   key: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    val missing = cols.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changeset is missing snapshot columns: ${missing.mkString(", ")}")
    val checked = changes.withColumn("change",
      when(col("change").isin("insert", "update", "delete"), col("change"))
        .otherwise(raise_error(concat(
          lit("Snapshot.applyChanges: bad change kind "), col("change")))))
    val survivors = snapshot.join(
      broadcast(checked.select(col(key))), Seq(key), "left_anti")
    survivors.unionByName(
      checked.where(col("change") =!= "delete").select(cols.map(col): _*))
  }
}
