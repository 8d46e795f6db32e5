package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins a training-data/event pipeline needs that vanilla SQL
  * joins express badly at scale: as-of (latest right row at or before each
  * left row) and band/range (pairs within a time window). Neither exists in
  * the reference (SURVEY.md §2.3 — "No outer/semi/anti/range/as-of joins");
  * both are first-class here because the naive formulations are quadratic.
  *
  * Both operators are pure composition — one keyed shuffle each, no custom
  * physical node needed:
  *
  *   - as-of: the classic union-and-carry-forward shape. A range join
  *     (`l.key = r.key AND r.ts <= l.ts`) executes as a broadcast
  *     nested-loop or cartesian-per-key in Spark — O(|L|·|R|) per key. The
  *     union shape is one shuffle by key + one sort, O((|L|+|R|) log) per
  *     partition, and AQE can split a skewed key's sort.
  *
  *   - band: equi-join on (key, time bucket) with the exact predicate as a
  *     post-filter. Bucketing turns the inequality into two equi-joins
  *     (bin, bin+1), so Catalyst plans hash joins with pushed filters —
  *     shuffle volume 2·N instead of a per-key cross product.
  */
object TemporalJoins {

  /** As-of join: for every left row, the values of the latest right row
    * with the same key and `rightTs <= leftTs` (microsecond longs), or
    * nulls when no such row exists (left-outer semantics).
    *
    * Implementation: tag and union both inputs, sort each key partition by
    * (ts, side) with right rows first at equal ts (giving `<=`), and
    * carry the right-side values forward with `last(..., ignoreNulls)`
    * over an unbounded-preceding frame — an incremental (running) window,
    * not a re-scan per row. `rightTieBreak` orders right rows that share a
    * timestamp; the latest one under that order wins, making the result
    * deterministic.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightVals: Seq[String],
               rightTieBreak: Option[String] = None): DataFrame = {
    require(rightVals.nonEmpty, "asOfJoin needs at least one right value column")
    val leftOut = left.columns.toSeq.filterNot(keys.contains)
    // a right value name colliding with a left output name would emit two
    // identically-named columns — unusable downstream (AMBIGUOUS_REFERENCE)
    require(rightVals.intersect(leftOut).isEmpty,
      s"asOfJoin right value columns ${rightVals.intersect(leftOut).mkString(", ")} " +
        "collide with left columns; alias one side first")
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rightStruct = struct(rightVals.map(col): _*)
    val rightStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v)))

    // join semantics on NULL keys: a NULL never matches anything, so
    // null-key left rows bypass the window (kept, unmatched) and null-key
    // right rows are dropped — Window.partitionBy alone would group NULLs
    // together and "match" them
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)

    val tie = rightTieBreak.map(col).getOrElse(lit(0L))
    // the right-side values travel as ONE struct: carrying each column
    // forward independently would stale-fill a NULL field of the latest
    // right row from an older row — a row that never existed
    val lu = left.where(keyNotNull).select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"), lit(0L).as("__tie")) ++
        leftOut.map(col) :+
        lit(null).cast(rightStructType).as("__r"): _*)
    // NULL right timestamps can match nothing (rightTs <= leftTs is NULL),
    // but ascending sort puts nulls FIRST — an unfiltered NULL-ts row would
    // sort before every left row and be carried forward as a fake match
    val ru = right.where(keyNotNull && col(rightTs).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"), tie.as("__tie")) ++
        leftOut.map(c => lit(null).cast(leftTypes(c)).as(c)) :+
        rightStruct.as("__r"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keys.map(col) ++ leftOut.map(col) ++
        rightVals.map(v => col("__m").getField(v).as(v)): _*)

    val nullKeyLeft = left.where(!coalesce(keyNotNull, lit(false))).select(
      keys.map(col) ++ leftOut.map(col) ++
        rightVals.map(v => lit(null).cast(rightStructType(v).dataType).as(v)): _*)
    matched.unionByName(nullKeyLeft)
  }

  /** Band self-join: all ordered pairs of rows sharing `keys` whose
    * timestamps (microsecond longs) satisfy `0 < ts_j − ts_i <= bandUs`
    * (ties broken by `idCol`: an equal-timestamp pair is emitted once,
    * smaller id first, with dt 0). Output: keys ++ (i, j, dt_us).
    *
    * Each row lands in bucket `floor(ts / bandUs)`; a qualifying partner is
    * in the same bucket or the next one, so the candidate set is two hash
    * equi-joins — never a per-key cross product. The two joins are disjoint
    * (different bucket equality), so no dedup pass is needed.
    */
  def bandJoin(events: DataFrame, keys: Seq[String], tsCol: String,
               idCol: String, bandUs: Long): DataFrame = {
    require(bandUs > 0, s"bandUs must be positive, got $bandUs")
    val e = events
      .select(keys.map(col) ++ Seq(
        col(idCol).as("id"), col(tsCol).as("ts"),
        floor(col(tsCol) / bandUs).as("bin")): _*)
    // both sides share e's lineage, so identically-named key columns would
    // make the condition an ambiguous self-join reference (Spark "repairs"
    // it with a trivially-true-predicate warning) — prefix every column
    def side(n: String) = e.select(
      keys.map(k => col(k).as(s"${n}_$k")) ++ Seq(
        col("id").as(s"${n}_id"), col("ts").as(s"${n}_ts"),
        col("bin").as(s"${n}_bin")): _*)
    val a = side("a")
    val b = side("b")
    val keyEq = keys.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _)
    val inBand = (col("b_ts") > col("a_ts") ||
      (col("b_ts") === col("a_ts") && col("b_id") > col("a_id"))) &&
      col("b_ts") <= col("a_ts") + bandUs
    val same = a.join(b, keyEq && col("a_bin") === col("b_bin") && inBand)
    val next = a.join(b, keyEq && col("b_bin") === col("a_bin") + 1 && inBand)
    def shape(df: DataFrame): DataFrame = df.select(
      keys.map(k => col(s"a_$k").as(k)) ++ Seq(col("a_id").as("i"),
        col("b_id").as("j"), (col("b_ts") - col("a_ts")).as("dt_us")): _*)
    shape(same).union(shape(next))
  }
}
