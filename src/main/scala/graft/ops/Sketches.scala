package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates with machine-checkable accuracy contracts.
  *
  * At corpus scale the exact forms are the bottleneck (count-distinct keeps
  * per-key sets; exact quantiles need a global sort), while the sketches —
  * HyperLogLog++ and the Greenwald-Khanna/KLL-style quantile summary behind
  * `approx_count_distinct` / `approx_percentile` — are single-pass,
  * fixed-memory, and merge associatively across partitions.
  *
  * An approximate answer can't hash-match an exact oracle, so each operator
  * returns its *contract*: the exact value (computed once, at test scale)
  * plus a flag that the sketch landed within its error bound. The oracle
  * checks the flag — the same pattern as the kNN/ANN recall queries.
  */
object Sketches {

  /** `approx_count_distinct` vs exact distinct count: emits one row
    * `(n_exact, ok)` with ok = 1 iff the relative error is within `rsd`
    * headroom (3 standard deviations of the configured rsd). */
  def distinctWithinRsd(df: DataFrame, colName: String,
                        rsd: Double = 0.05): DataFrame =
    df.agg(
      countDistinct(col(colName)).as("n_exact"),
      approx_count_distinct(col(colName), rsd).as("__n_approx"))
      .select(col("n_exact"),
        (abs(col("__n_approx") - col("n_exact")) <=
          greatest(col("n_exact") * (3 * rsd), lit(1.0)))
          .cast("long").as("ok"))

  /** Pre-aggregated distinct-count rollup — the 100 TB sketch pattern:
    * per-day DataSketches HLL sketches (`hll_sketch_agg`) are built ONCE,
    * then coarser windows (here weeks) merge the daily sketches with
    * `hll_union_agg` WITHOUT re-touching rows — the daily sketch table is
    * what a production pipeline persists, and any rollup (week, month,
    * arbitrary ad-hoc range) is a cheap union over kilobyte blobs instead
    * of a re-scan of the raw events. Emits one row per week:
    * `(week, n_exact, ok)` with ok = 1 iff the merged estimate is within
    * `tol` of the exact recomputation — so the machine check covers the
    * sketch build, the merge, AND the estimate. */
  def hllWeeklyRollup(events: DataFrame, keyCol: String,
                      tol: Double = 0.05): DataFrame = {
    val base = events.select(
      expr("CAST(date_trunc('week', ts) AS DATE)").as("week"),
      to_date(col("ts")).as("day"), col(keyCol).as("__k"))
    val daily = base.groupBy("week", "day")
      .agg(expr("hll_sketch_agg(__k)").as("sk"))
    val weeklyEst = daily.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__est"))
    val weeklyExact = base.groupBy("week")
      .agg(countDistinct("__k").as("n_exact"))
    weeklyExact.join(weeklyEst, "week")
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("n_exact"),
        (abs(col("__est") - col("n_exact")) <=
          greatest(col("n_exact") * tol, lit(1.0)))
          .cast("long").as("ok"))
  }

  /** Pre-aggregated QUANTILE rollup — [[hllWeeklyRollup]]'s pattern for
    * order statistics: per-day DataSketches KLL sketches
    * (`kll_sketch_agg_double`) are built once, then weeks merge the daily
    * sketches with `kll_merge_agg_double` WITHOUT re-touching rows, and
    * quantiles read off the merged sketch. The daily sketch table is what a
    * production pipeline persists (a few KB per day at k=200); any ad-hoc
    * range's p50/p90/p99 is a blob merge, not an events re-scan — the exact
    * alternative ([[exactQuantilesPerStratum]]) costs a full prefix scan
    * per regrouping.
    *
    * The machine check covers build + merge + estimate with the sketch's
    * ACTUAL guarantee (normalized rank error, ≈1.65% at k=200): for each
    * requested rank q, the estimated value v must have its true rank
    * interval [P(x < v), P(x ≤ v)] within `rankTol` of q — the same
    * interval form as [[quantilesWithinRankError]] (testing only P(x ≤ v)
    * false-fails duplicate-heavy columns). Emits one row per week:
    * `(week, n, ok)`; n = non-null values, exact. */
  def kllWeeklyQuantileRollup(events: DataFrame, valueCol: String,
                              qs: Seq[Double], k: Int = 200,
                              rankTol: Double = 0.03): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile rank")
    qs.foreach(q => require(q > 0 && q < 1, s"rank $q must be in (0, 1)"))
    val base = events.select(
      expr("CAST(date_trunc('week', ts) AS DATE)").as("week"),
      to_date(col("ts")).as("day"), col(valueCol).cast("double").as("__v"))
    val daily = base.groupBy("week", "day")
      .agg(expr(s"kll_sketch_agg_double(__v, $k)").as("sk"))
    val weekly = daily.groupBy("week")
      .agg(expr(s"kll_merge_agg_double(sk, $k)").as("msk"))
    val est = weekly.select(col("week") +:
      qs.indices.map(i => expr(
        s"kll_sketch_get_quantile_double(msk, ${qs(i)})").as(s"__q_$i")): _*)
    // |weeks| rows of estimates broadcast back; one hash agg per week
    // recomputes the exact rank interval of each estimated value
    val aggCols = count(col("__v")).as("n") +:
      qs.indices.flatMap(i => Seq(
        (sum(when(col("__v") < col(s"__q_$i"), 1L).otherwise(0L)) /
          count(col("__v"))).as(s"__lo_$i"),
        (sum(when(col("__v") <= col(s"__q_$i"), 1L).otherwise(0L)) /
          count(col("__v"))).as(s"__hi_$i")))
    base.join(broadcast(est), "week")
      .groupBy("week").agg(aggCols.head, aggCols.tail: _*)
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"), col("n"),
        qs.indices.map(i =>
          (lit(qs(i)) >= col(s"__lo_$i") - rankTol &&
            lit(qs(i)) <= col(s"__hi_$i") + rankTol).cast("long"))
          .reduce(_ * _).as("ok"))
  }

  /** Audience overlap via theta sketches — the mergeable-sketch operation
    * HLL fundamentally cannot do: per-group theta sketches of a key
    * (`theta_sketch_agg`) support INTERSECTION and DIFFERENCE, not just
    * union, so "users who did A and B" across any ad-hoc group pair is a
    * kilobyte-blob operation on the persisted per-group sketch table —
    * never a re-scan, never an exact-set join. Emits one row per unordered
    * group pair: `(g_a, g_b, n_a, n_b, n_both, ok)` where n_a/n_b/n_both
    * are EXACT distinct counts (the oracle's half) and ok = 1 iff the
    * sketch-estimated intersection is within `tol` of n_both — the machine
    * check for build + pairwise `theta_intersection` + estimate.
    *
    * Error note: intersection error scales with the UNION's sketch error
    * (Dasgupta et al., "Theta-Sketch Framework"), so `tol` is relative to
    * the union size, floored at 2 — a tiny true overlap of two big sets
    * is exactly where theta's guarantee is loose. */
  def thetaPairOverlap(events: DataFrame, groupCol: String, keyCol: String,
                       tol: Double = 0.05): DataFrame = {
    val base = events.select(col(groupCol).as("g"), col(keyCol).as("__k"))
    // one pass: per-group sketch + exact distinct side by side
    val per = base.groupBy("g").agg(
      expr("theta_sketch_agg(__k)").as("sk"),
      countDistinct(col("__k")).as("n"))
      .localCheckpoint() // consumed by both sides of the self-join
    val pairsEst = per.select(col("g").as("g_a"), col("sk").as("sk_a"),
        col("n").as("n_a"))
      .join(per.select(col("g").as("g_b"), col("sk").as("sk_b"),
        col("n").as("n_b")), col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
          .as("__est"),
        expr("theta_sketch_estimate(theta_union(sk_a, sk_b))").as("__uest"))
    // exact pairwise overlap, computed like the oracle will: the deduped
    // (g, k) table self-joined on k — shuffle ∝ distinct memberships
    val mem = base.distinct()
    val exactBoth = mem.select(col("g").as("g_a"), col("__k"))
      .join(mem.select(col("g").as("g_b"), col("__k")), Seq("__k"))
      .where(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b").agg(count(lit(1)).as("n_both"))
    pairsEst.join(exactBoth, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        (abs(col("__est") - coalesce(col("n_both"), lit(0L))) <=
          greatest(col("__uest") * tol, lit(2.0))).cast("long").as("ok"))
  }

  /** N-gram diversity per source plus the corpus rollup — the dedup
    * headroom signal ("how much of this source is distinct content, and
    * how much of the corpus total does each source actually add"): per
    * source, total 3-gram occurrences and the distinct estimate from a
    * per-source DataSketches HLL; the `__all__` row merges the per-source
    * sketches with `hll_union_agg` WITHOUT re-touching text — at 100 TB
    * the per-source sketch table is what persists, and any regrouping
    * (source sets, crawls, time slices) is a kilobyte-blob union. The
    * exact distinct counts exist ONLY to machine-check the estimates
    * (`ok` = within `tol`), the same contract as [[hllWeeklyRollup]].
    * Emits `(source, n_grams, n_exact, ok)`, one row per source plus
    * `__all__`. */
  def ngramDiversity(docs: DataFrame, n: Int = 3,
                     tol: Double = 0.05): DataFrame = {
    val sh = graft.pipeline.Dedup.shingles(docs, n, keepPos = true,
      carry = Seq("source"))
    // materialize the |sources|-row sketch table: the union plan below
    // references it from two branches, and Catalyst does not share common
    // subplans across a union — without the cut, the corpus-scale gram
    // build would run once per branch (measured 3× at sf1eq)
    val perSource = sh.groupBy("source").agg(
      count(lit(1)).as("n_grams"),
      countDistinct("sh_hash").as("n_exact"),
      expr("hll_sketch_agg(sh_hash)").as("__sk"))
      .localCheckpoint()
    val allRow = perSource.agg(
      sum("n_grams").as("n_grams"),
      expr("hll_sketch_estimate(hll_union_agg(__sk))").as("__est"))
      .crossJoin(broadcast(
        sh.agg(countDistinct("sh_hash").as("n_exact"))))
      .select(lit("__all__").as("source"), col("n_grams"), col("n_exact"),
        col("__est"))
    val okCol = (abs(col("__est") - col("n_exact")) <=
      greatest(col("n_exact") * tol, lit(1.0))).cast("long").as("ok")
    perSource
      .select(col("source"), col("n_grams"), col("n_exact"),
        expr("hll_sketch_estimate(__sk)").as("__est"))
      .unionByName(allRow)
      .select(col("source"), col("n_grams"), col("n_exact"), okCol)
  }

  /** Count-min sketch vs exact heavy-hitter counts: emits one row
    * `(n, ok)` with ok = 1 iff every top-`topN` item's sketch estimate
    * respects the CMS guarantee — never below the true count, and at most
    * `eps · n` above it (with the configured confidence). The sketch is a
    * fixed-size, mergeable, single-pass summary — the frequency-stats
    * shape for a corpus too large to hold exact per-token counts. */
  def heavyHittersWithinError(items: DataFrame, colName: String, topN: Int = 20,
                              eps: Double = 0.001, confidence: Double = 0.99,
                              seed: Int = 42): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val exact = items.groupBy(col(colName))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(colName)).limit(topN).collect()
    // total count and the sketch ride in ONE aggregation pass
    val aggRow = items.agg(count(lit(1)).as("n"),
      count_min_sketch(col(colName), lit(eps), lit(confidence), lit(seed))).head()
    val total = aggRow.getLong(0)
    val sketchBytes = aggRow.getAs[Array[Byte]](1)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val bound = math.ceil(eps * total).toLong
    val okAll = exact.forall { r =>
      val est = cms.estimateCount(r.get(0))
      est >= r.getLong(1) && est <= r.getLong(1) + bound
    }
    Seq((total, if (okAll) 1L else 0L)).toDF("n", "ok")
  }

  /** `approx_percentile` vs the exact empirical CDF: emits one row
    * `(n, ok)` with ok = 1 iff every approximate quantile is a value whose
    * rank *interval* covers the target within `rankTol` — the sketch's
    * actual guarantee (rank error ≤ 1/accuracy). A value v occupies the
    * whole rank range [P(x < v), P(x ≤ v)]; on duplicate-heavy columns
    * that interval is wide, and testing only P(x ≤ v) would false-fail a
    * correct sketch (e.g. one value spanning ranks 0.3–0.9 is the right
    * answer for q = 0.5). Checked without a global sort: one pass for the
    * sketch, one aggregation against the broadcast approximations. */
  def quantilesWithinRankError(df: DataFrame, colName: String,
                               qs: Seq[Double], accuracy: Int = 10000,
                               rankTol: Double = 0.005): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    val approx = df.agg(percentile_approx(col(colName),
      array(qs.map(lit): _*), lit(accuracy)).as("aq"))
    // denominators use count(col), not count(*): percentile_approx ignores
    // NULLs, so ranks must be over the non-null population too — with
    // count(*) a 50%-NULL column would roughly halve every rank and
    // false-fail a sketch that meets its guarantee
    val aggCols = count(col(colName)).as("n") +:
      qs.indices.flatMap(i => Seq(
        (sum(when(col(colName) < col("aq")(i), 1L).otherwise(0L)) /
          count(col(colName))).as(s"__lo_$i"),
        (sum(when(col(colName) <= col("aq")(i), 1L).otherwise(0L)) /
          count(col(colName))).as(s"__hi_$i")))
    val checks = df.crossJoin(approx).agg(aggCols.head, aggCols.tail: _*)
    checks.select(col("n"),
      qs.indices.map(i =>
        (lit(qs(i)) >= col(s"__lo_$i") - rankTol &&
          lit(qs(i)) <= col(s"__hi_$i") + rankTol).cast("long"))
        .reduce(_ * _).as("ok"))
  }

  /** EXACT per-stratum quantiles at scale — the exact counterpart of
    * [[quantilesWithinRankError]]'s sketch, for when the cutoff feeds a
    * correctness-bearing decision (quality thresholds, shard boundaries)
    * rather than monitoring. For each stratum and each quantile
    * `name -> (num, den)`, returns the value at ascending rank
    * `max(1, ceil(count · num / den))` — the classic "nearest-rank"
    * definition in exact INTEGER arithmetic (quantiles are rationals, not
    * floats, so the picked rank is engine-exact; ties in the value are
    * broken by the deterministic hash order, so the picked ROW is too).
    * Rows with a NULL value are excluded (they have no rank).
    *
    * Shape: the textbook `PERCENT_RANK()`/`NTILE()` spelling sorts each
    * stratum in one task; this is the shared two-phase distributed prefix
    * scan ([[Sampling.tokenBudgetSample]]) ordered by (value, hash, key),
    * plus one broadcast join against the |strata| × |quantiles| target
    * table. Driver traffic: one count per stratum. Output:
    * `(strataCol, quantile, valueCol)`. */
  def exactQuantilesPerStratum(df: DataFrame, keyCol: String,
                               strataCol: String, valueCol: String,
                               quantiles: Map[String, (Long, Long)],
                               salt: String = "quant",
                               partitions: Int = 0): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, (num, den)) =>
      require(den > 0 && num >= 0 && num <= den,
        s"quantile $n must be a fraction in [0, 1], got $num/$den")
    }
    val spark = df.sparkSession
    val nonNull = df.where(col(valueCol).isNotNull)
    val counts = nonNull.groupBy(col(strataCol)).count().collect()
      .map(r => (r.get(0), r.getLong(1)))
    val targets: Seq[org.apache.spark.sql.Row] = counts.toSeq.flatMap {
      case (g, c) =>
        quantiles.toSeq.map { case (qn, (num, den)) =>
          val rank = ((BigInt(c) * BigInt(num) + BigInt(den) - 1)
            / BigInt(den)).toLong max 1L
          org.apache.spark.sql.Row(g, qn, rank)
        }
    }
    val tSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__t",
        df.schema(strataCol).dataType),
      org.apache.spark.sql.types.StructField("quantile",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__target",
        org.apache.spark.sql.types.LongType)))
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(targets, 1), tSchema)
    val ranked = Sampling.stratumPrefixCum(nonNull, keyCol, strataCol,
      lit(1L), sortByScore = Some(col(valueCol)), "__rank", salt, partitions,
      scoreAscending = true)
    ranked.join(broadcast(tdf),
        ranked(strataCol) <=> tdf("__t") &&
          ranked("__rank") === tdf("__target"))
      .select(col(strataCol), col("quantile"), col(valueCol))
  }

  /** WEIGHTED exact per-stratum quantiles — [[exactQuantilesPerStratum]]
    * over a mass column instead of row count: the quantile value is the
    * first row (in deterministic (value, hash, key) order) whose
    * cumulative weight reaches `ceil(q · W)`, W = the stratum's total
    * weight. The datacard stat row-weighted quantiles misstate: "the
    * token-weighted median document length" weights every document by
    * its token mass, so half the CORPUS TOKENS sit in docs at or below
    * the reported value — a handful of huge docs move it where a row
    * median would not.
    *
    * Exact-integer: the rank targets are `max(1, ceil(W·num/den))` in
    * BigInt on the driver (one weight-sum per stratum — |strata| rows),
    * and the crossing test `cw − w < target ≤ cw` is all-long, so the
    * selected rows are exactly recomputable in SQL. Zero-weight rows can
    * never cross a target (cw − 0 < t ≤ cw is empty) and NULL weights
    * count as zero, matching [[Sampling.tokenBudgetSample]]'s token rule.
    *
    * Shape at scale: the shared two-phase per-stratum prefix scan with
    * the weight as the summed mass (never a one-task window), plus one
    * broadcast join against the |strata| × |quantiles| target table. */
  def weightedQuantilesPerStratum(df: DataFrame, keyCol: String,
                                  strataCol: String, valueCol: String,
                                  weight: Column,
                                  quantiles: Map[String, (Long, Long)],
                                  salt: String = "wquant",
                                  partitions: Int = 0): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (n, (num, den)) =>
      require(den > 0 && num >= 0 && num <= den,
        s"quantile $n must be a fraction in [0, 1], got $num/$den")
    }
    val spark = df.sparkSession
    val w = coalesce(weight.cast("long"), lit(0L))
    val nonNull = df.where(col(valueCol).isNotNull)
      .withColumn("__wq_w", w)
    val totals = nonNull.groupBy(col(strataCol))
      .agg(sum(col("__wq_w")).as("__W")).collect()
      .map(r => (r.get(0), r.getLong(1)))
    val targets: Seq[org.apache.spark.sql.Row] = totals.toSeq.flatMap {
      case (g, tw) =>
        quantiles.toSeq.map { case (qn, (num, den)) =>
          val rank = ((BigInt(tw) * BigInt(num) + BigInt(den) - 1)
            / BigInt(den)).toLong max 1L
          org.apache.spark.sql.Row(g, qn, rank)
        }
    }
    val tSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__t",
        df.schema(strataCol).dataType),
      org.apache.spark.sql.types.StructField("quantile",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("__target",
        org.apache.spark.sql.types.LongType)))
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(targets, 1), tSchema)
    val ranked = Sampling.stratumPrefixCum(nonNull, keyCol, strataCol,
      col("__wq_w"), sortByScore = Some(col(valueCol)), "__cw", salt,
      partitions, scoreAscending = true)
    ranked.join(broadcast(tdf),
        ranked(strataCol) <=> tdf("__t") &&
          ranked("__cw") >= tdf("__target") &&
          ranked("__cw") - ranked("__wq_w") < tdf("__target"))
      .select(col(strataCol), col("quantile"), col(valueCol))
  }
}
