package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Hashing

/** Linear-model training by sufficient statistics — the canonical
  * "fit a (quality) regressor on 100 TB" shape: the whole corpus is
  * reduced in ONE pass to the d×d Gram matrix `G = XᵀX` and moment
  * vector `b = Xᵀy` (d(d+3)/2 + 1 long sums, all map-side combinable —
  * shuffle is one row of longs per partition), and the d×d solve happens
  * on the driver. No iterations, no per-row model state, nothing scales
  * with N except the single aggregation — the same
  * sufficient-statistics trick `olsTrendPerGroup` uses per group,
  * generalized to multivariate ridge.
  *
  * Exactness contract (matching the repo's oracle style): feature and
  * label columns must be INTEGER-VALUED (they are cast to long; callers
  * pre-scale grid values — e.g. micro-units — like every other exact
  * operator here). The moments are then exact longs on any engine and
  * any partitioning, and for d = 2 features the solve is Cramer's rule
  * spelled in a fixed association order, so the coefficients are
  * bit-identical cross-engine (`q_ridge_quality` hash-checks them
  * against a DuckDB oracle that recomputes the same expansion).
  * Overflow bound: Σ|x_i·x_j| and Σ|x_i·y| must stay under 2^63 —
  * e.g. 1e3-scale features × 1e6-scale micro labels hold to ~10^9 rows;
  * rescale features before training past that.
  */
object Fit {

  /** Ridge regression via the normal equations `(G + λI')w = b`, where
    * `I'` regularizes the feature diagonals only (never the intercept —
    * index 0 of the returned weights). Rows with a NULL feature or label
    * are excluded. Returns `(rowsUsed, weights)` with
    * `weights(0) = intercept`. */
  def ridgeNormal(df: DataFrame, features: Seq[String], labelCol: String,
                  lambda: Double = 1.0): (Long, Array[Double]) = {
    val (n, g, b) = normalMoments(df, features, labelCol, lambda)
    val w =
      if (b.length == 3) cramer3(g, b) // oracle-exact fixed-association path
      else gaussianSolve(g, b)
    (n, w)
  }

  /** The one-pass moment reduction behind [[ridgeNormal]] (and the LOO
    * influence operator): exact long sums → the λ-regularized normal
    * matrix `A = G + λI'` and moment vector `b`, as driver doubles. */
  private[ops] def normalMoments(df: DataFrame, features: Seq[String],
                                 labelCol: String, lambda: Double)
      : (Long, Array[Array[Double]], Array[Double]) = {
    require(features.nonEmpty, "need at least one feature column")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val d = features.size + 1 // intercept first
    val xs = lit(1L) +: features.map(col(_).cast("long"))
    val y = col(labelCol).cast("long")
    val clean = df.where(
      (features :+ labelCol).map(col(_).isNotNull).reduce(_ && _))
    val gAggs = for { i <- 0 until d; j <- i until d }
      yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")
    val bAggs = (0 until d).map(i => sum(xs(i) * y).as(s"b_$i"))
    val aggs = gAggs ++ bAggs
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(row.fieldIndex("g_0_0"))
    require(n > 0, "ridgeNormal needs at least one complete row")

    val g = Array.ofDim[Double](d, d)
    for { i <- 0 until d; j <- i until d } {
      val v = row.getLong(row.fieldIndex(s"g_${i}_$j")).toDouble
      g(i)(j) = v
      g(j)(i) = v
    }
    (1 until d).foreach(i => g(i)(i) += lambda)
    val b = Array.tabulate(d)(i => row.getLong(row.fieldIndex(s"b_$i")).toDouble)
    (n, g, b)
  }

  /** First-row cofactor expansion, the EXACT association order the
    * DuckDB oracle mirrors term-for-term. */
  private[ops] def det3(m: Array[Array[Double]]): Double =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  private def cramer3(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val det = det3(a)
    require(det != 0.0, "singular normal equations (det = 0); raise lambda")
    Array.tabulate(3) { k =>
      val mk = Array.tabulate(3, 3)((i, j) => if (j == k) b(i) else a(i)(j))
      det3(mk) / det
    }
  }

  /** Partial-pivot Gaussian elimination for d > 2 features (driver-side
    * d×d — no oracle contract past d = 2; deterministic for a given
    * moment matrix). */
  private def gaussianSolve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val d = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    for (k <- 0 until d) {
      val p = (k until d).maxBy(i => math.abs(a(i)(k)))
      require(a(p)(k) != 0.0, "singular normal equations; raise lambda")
      if (p != k) { val t = a(p); a(p) = a(k); a(k) = t
        val tb = b(p); b(p) = b(k); b(k) = tb }
      for (i <- k + 1 until d) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until d) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val w = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var acc = b(i)
      for (j <- i + 1 until d) acc -= a(i)(j) * w(j)
      w(i) = acc / a(i)(i)
    }
    w
  }

  /** Per-group ridge for two features — "train a quality model per
    * source/domain in one pass": the grouped moment sums are ONE hash
    * aggregate (map-side combinable, shuffle ∝ groups), and the 3×3
    * Cramer solve is expressed as Column arithmetic in the same fixed
    * association order as [[det3]], so the whole operator is distributed
    * end-to-end — no driver data path at all, group count unbounded.
    * Same integer-valued-column exactness contract as [[ridgeNormal]];
    * groups whose regularized normal matrix is singular (only possible
    * at λ=0) report NULL weights. Returns
    * `(group, n, w0, w1, w2)` unrounded. */
  def ridgePerGroupD2(df: DataFrame, groupCol: String,
                      f1: String, f2: String, labelCol: String,
                      lambda: Double = 1.0): DataFrame = {
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val x1 = col(f1).cast("long")
    val x2 = col(f2).cast("long")
    val y = col(labelCol).cast("long")
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    val m = clean.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x1).as("s1"), sum(x2).as("s2"),
        sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"),
        sum(x2 * x2).as("s22"),
        sum(y).as("c0"), sum(x1 * y).as("c1"), sum(x2 * y).as("c2"))
    val d = (c: String) => col(c).cast("double")
    val (a00, a01, a02) = (d("n"), d("s1"), d("s2"))
    val (a10, a11, a12) = (d("s1"), d("s11") + lit(lambda), d("s12"))
    val (a20, a21, a22) = (d("s2"), d("s12"), d("s22") + lit(lambda))
    val (c0, c1, c2) = (d("c0"), d("c1"), d("c2"))
    // first-row cofactor expansion — the det3 association, in Columns
    val det = a00 * (a11 * a22 - a12 * a21) -
      a01 * (a10 * a22 - a12 * a20) +
      a02 * (a10 * a21 - a11 * a20)
    val det0 = c0 * (a11 * a22 - a12 * a21) -
      a01 * (c1 * a22 - a12 * c2) +
      a02 * (c1 * a21 - a11 * c2)
    val det1 = a00 * (c1 * a22 - a12 * c2) -
      c0 * (a10 * a22 - a12 * a20) +
      a02 * (a10 * c2 - c1 * a20)
    val det2 = a00 * (a11 * c2 - c1 * a21) -
      a01 * (a10 * c2 - c1 * a20) +
      c0 * (a10 * a21 - a11 * a20)
    def safe(num: org.apache.spark.sql.Column) =
      when(det === 0.0, lit(null).cast("double")).otherwise(num / det)
    m.select(col(groupCol), col("n"),
      safe(det0).as("w0"), safe(det1).as("w1"), safe(det2).as("w2"))
  }

  /** Map-side application of a trained model: ŷ = w₀ + Σ wᵢ·xᵢ, in the
    * weights' index order — a pure projection, no shuffle. */
  def predict(df: DataFrame, features: Seq[String],
              weights: Array[Double],
              outCol: String = "prediction"): DataFrame = {
    require(weights.length == features.size + 1,
      s"need ${features.size + 1} weights (intercept first), got ${weights.length}")
    val expr = features.zipWithIndex.foldLeft(lit(weights(0))) {
      case (acc, (f, i)) => acc + lit(weights(i + 1)) * col(f).cast("double")
    }
    df.withColumn(outCol, expr)
  }

  /** Leave-one-out influence for the two-feature ridge model — closed-form
    * data attribution: which rows does the quality model owe its fit to,
    * and which fight it? For ridge via normal equations the LOO refit has
    * an exact Sherman–Morrison form — no N retrains: with
    * `A = G + λI'`, leverage `h_i = x_iᵀ A⁻¹ x_i` and the residual the
    * REFIT-WITHOUT-i model gives row i is `e_i / (1 − h_i)`. High |loo|
    * = outlier/mislabeled candidate; high leverage = the row single-
    * handedly anchors the fit — the standard pruning/inspection signals.
    *
    * Scale shape: the training pass is [[ridgeNormal]]'s single moment
    * aggregation; A⁻¹ is a driver 3×3 (six doubles); scoring is a pure
    * map-side projection with the six inverse entries + three weights as
    * literals. Nothing scales with N but the one aggregate and the map.
    *
    * Exactness: moments are exact longs; the 3×3 inverse and weights are
    * fixed-association cofactor expansions ([[det3]]'s order), and the
    * per-row quadratic form is spelled `(t0 + t1·x1) + t2·x2` — every
    * IEEE step mirrored term-for-term by the `q_loo_influence` oracle, so
    * resid/leverage/loo are bit-identical cross-engine. Emits
    * `(idCol, resid, leverage, loo_resid)` unrounded, complete rows only. */
  def looInfluenceD2(df: DataFrame, idCol: String, f1: String, f2: String,
                     labelCol: String, lambda: Double = 1.0): DataFrame = {
    val (_, a, b) = normalMoments(df, Seq(f1, f2), labelCol, lambda)
    val det = det3(a)
    require(det != 0.0, "singular normal equations (det = 0); raise lambda")
    val w = cramer3(a, b)
    // symmetric 3×3 inverse by adjugate — each cofactor in the exact
    // spelling the oracle mirrors
    val m00 = (a(1)(1) * a(2)(2) - a(1)(2) * a(2)(1)) / det
    val m01 = -(a(0)(1) * a(2)(2) - a(0)(2) * a(2)(1)) / det
    val m02 = (a(0)(1) * a(1)(2) - a(0)(2) * a(1)(1)) / det
    val m11 = (a(0)(0) * a(2)(2) - a(0)(2) * a(2)(0)) / det
    val m12 = -(a(0)(0) * a(1)(2) - a(0)(2) * a(1)(0)) / det
    val m22 = (a(0)(0) * a(1)(1) - a(0)(1) * a(1)(0)) / det
    val x1 = col(f1).cast("long").cast("double")
    val x2 = col(f2).cast("long").cast("double")
    val y = col(labelCol).cast("long").cast("double")
    val resid = y - (lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2)
    val t0 = lit(m00) + lit(m01) * x1 + lit(m02) * x2
    val t1 = lit(m01) + lit(m11) * x1 + lit(m12) * x2
    val t2 = lit(m02) + lit(m12) * x1 + lit(m22) * x2
    val h = t0 + t1 * x1 + t2 * x2
    df.where(Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
      .select(col(idCol), resid.as("resid"), h.as("leverage"),
        (resid / (lit(1.0) - h)).as("loo_resid"))
  }

  /** k-fold cross-validated ridge in TWO corpus passes — honest held-out
    * model selection at any corpus size, no k retrains: rows hash into k
    * disjoint folds ([[Hashing.hash60]] on the id — deterministic,
    * append-stable, the same membership rule every sampler here uses);
    * ONE grouped aggregate reduces the corpus to k rows of exact long
    * moments; each fold's training moments are TOTAL − fold (exact long
    * subtraction — leave-one-fold-out by arithmetic, not by re-scanning);
    * the k models solve via the [[det3]] Cramer association IN COLUMNS
    * (the [[ridgePerGroupD2]] spelling); the second pass scores every
    * row against its own held-out model (a k-row broadcast join) and
    * reduces per-fold SSE over INTEGER-rounded residuals — long sums, no
    * float order, so per-fold MSE is bit-identical cross-engine
    * (residuals are micro-unit-scale; Σ resid² < 2^63 holds to ~10^6
    * rows of 10^6-magnitude labels — same overflow contract as the
    * moment sums).
    *
    * Emits one row per fold: `(fold, n_train, w0, w1, w2, n_test, mse)`
    * unrounded. The quality-model use: pick λ / feature sets by held-out
    * MSE instead of training-set fit, with the entire procedure costing
    * two aggregates regardless of N. */
  def cvRidgeD2(df: DataFrame, idCol: String, f1: String, f2: String,
                labelCol: String, k: Int = 5, lambda: Double = 1.0,
                salt: String = "cv"): DataFrame = {
    require(k >= 2, s"need at least 2 folds, got $k")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val x1 = col(f1).cast("long")
    val x2 = col(f2).cast("long")
    val y = col(labelCol).cast("long")
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    val fold = pmod(Hashing.hash60(
      concat(coalesce(col(idCol).cast("string"), lit("null")),
        lit("#" + salt))), lit(k.toLong))
    val rows = clean.select(col(idCol), x1.as("x1"), x2.as("x2"),
      y.as("y"), fold.as("fold"))
    val fm = rows.groupBy("fold").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("y")).as("c0"), sum(col("x1") * col("y")).as("c1"),
      sum(col("x2") * col("y")).as("c2"))
    val moments = Seq("n", "s1", "s2", "s11", "s12", "s22", "c0", "c1", "c2")
    val tot = fm.agg(moments.map(m => sum(col(m)).as(s"t_$m")).head,
      moments.map(m => sum(col(m)).as(s"t_$m")).tail: _*)
    // training moments = total − this fold, exact longs
    val tr = fm.crossJoin(broadcast(tot))
      .select(col("fold") +: col("n") +:
        moments.map(m => (col(s"t_$m") - col(m)).as(s"r_$m")): _*)
    val d = (c: String) => col(c).cast("double")
    val (a00, a01, a02) = (d("r_n"), d("r_s1"), d("r_s2"))
    val (a10, a11, a12) = (d("r_s1"), d("r_s11") + lit(lambda), d("r_s12"))
    val (a20, a21, a22) = (d("r_s2"), d("r_s12"), d("r_s22") + lit(lambda))
    val (c0, c1, c2) = (d("r_c0"), d("r_c1"), d("r_c2"))
    // first-row cofactor expansion — the det3 association, in Columns
    val det = a00 * (a11 * a22 - a12 * a21) -
      a01 * (a10 * a22 - a12 * a20) +
      a02 * (a10 * a21 - a11 * a20)
    val det0 = c0 * (a11 * a22 - a12 * a21) -
      a01 * (c1 * a22 - a12 * c2) +
      a02 * (c1 * a21 - a11 * c2)
    val det1 = a00 * (c1 * a22 - a12 * c2) -
      c0 * (a10 * a22 - a12 * a20) +
      a02 * (a10 * c2 - c1 * a20)
    val det2 = a00 * (a11 * c2 - c1 * a21) -
      a01 * (a10 * c2 - c1 * a20) +
      c0 * (a10 * a21 - a11 * a20)
    val models = tr.select(col("fold"), (col("r_n")).as("n_train"),
      (det0 / det).as("w0"), (det1 / det).as("w1"), (det2 / det).as("w2"))
    // pass 2: every row scored by ITS OWN held-out model; residuals
    // rounded to integer label units so the SSE is an exact long sum
    val scored = rows.join(broadcast(models), "fold")
    val residQ = floor(col("y").cast("double") -
      (col("w0") + col("w1") * col("x1").cast("double") +
        col("w2") * col("x2").cast("double")) + lit(0.5)).cast("long")
    scored.groupBy("fold")
      .agg(count(lit(1)).as("n_test"), sum(residQ * residQ).as("sse"))
      .join(models, "fold")
      .select(col("fold"), col("n_train"), col("w0"), col("w1"), col("w2"),
        col("n_test"), col("sse"),
        (col("sse").cast("double") / col("n_test").cast("double")).as("mse"))
  }

  /** Reliability diagram (calibration report) for the two-feature ridge
    * model: rows bucket into `nBuckets` equal-depth bins by PREDICTED
    * score, and each bin reports mean predicted vs mean actual — the
    * standard "is the quality model honest at the top of its range"
    * check before its scores gate a corpus. A well-calibrated model
    * tracks the diagonal; divergence in the top bin is exactly where a
    * curation threshold does damage.
    *
    * Exactness: predictions quantize to integer label units (one IEEE
    * chain + floor, bit-identical cross-engine), the equal-depth bin
    * comes from the exact global rank over `(pred, hash, id)` via the
    * two-phase prefix scan (never a one-task window), and per-bin sums
    * are exact longs with two terminal divisions. Emits
    * `(bucket, n, sp, sy, mean_pred, mean_actual)`. */
  def calibrationD2(df: DataFrame, idCol: String, f1: String, f2: String,
                    labelCol: String, nBuckets: Int = 10,
                    lambda: Double = 1.0, salt: String = "cal"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val (_, w) = ridgeNormal(df, Seq(f1, f2), labelCol, lambda)
    val x1 = col(f1).cast("long").cast("double")
    val x2 = col(f2).cast("long").cast("double")
    val pred = lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    val scored = clean.select(col(idCol), col(labelCol).cast("long").as("__y"),
      floor(pred + lit(0.5)).cast("long").as("__p"))
      .withColumn("__all", lit("all"))
    val total = scored.count()
    require(total > 0, "calibrationD2 needs at least one complete row")
    val ranked = Sampling.stratumPrefixCum(scored, idCol, "__all", lit(1L),
      sortByScore = Some(col("__p")), "__rank", salt, partitions = 0,
      scoreAscending = true)
    ranked
      .withColumn("bucket", expr(s"((__rank - 1) * $nBuckets) div ${total}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("__p").as("sp"), sum("__y").as("sy"))
      .select(col("bucket"), col("n"), col("sp"), col("sy"),
        (col("sp").cast("double") / col("n").cast("double")).as("mean_pred"),
        (col("sy").cast("double") / col("n").cast("double")).as("mean_actual"))
  }

  /** Split-conformal prediction intervals for the two-feature ridge
    * model — DISTRIBUTION-FREE uncertainty with a finite-sample
    * guarantee: train on the `fit` slice, take the conformal quantile
    * `q` = the `⌈(n_cal+1)(1−α)⌉`-th smallest |residual| on the held-out
    * `cal` slice, and `pred ± q` then covers a fresh row's label with
    * probability ≥ 1−α under exchangeability alone — no noise model, no
    * asymptotics (Vovk et al.; the Lei et al. split-conformal recipe).
    * The report checks the guarantee empirically: coverage counted on a
    * third `test` slice the procedure never touched.
    *
    * Exactness: the three slices are the deterministic hash split;
    * residuals quantize to integer label units; the quantile is the
    * exact nearest-rank VALUE over `(score, hash, id)` via the two-phase
    * prefix scan; coverage is an integer count — every cross-engine
    * value is a long or a bit-identical double. Driver sees two counts
    * and one rank value, never data. Emits one row:
    * `(n_fit, n_cal, n_test, q, n_covered)`. */
  def conformalD2(df: DataFrame, idCol: String, f1: String, f2: String,
                  labelCol: String, alphaNum: Long = 1L, alphaDen: Long = 10L,
                  lambda: Double = 1.0, salt: String = "conf"): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a fraction in (0, 1), got $alphaNum/$alphaDen")
    val spark = df.sparkSession
    import spark.implicits._
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    val split = Sampling.assignSplit(clean, idCol,
      Seq("fit" -> 0.5, "cal" -> 0.25, "test" -> 0.25), salt)
      .localCheckpoint() // consumed 4×: train, cal rank, test count, cover
    val (nFit, w) = ridgeNormal(split.where(col("split") === "fit"),
      Seq(f1, f2), labelCol, lambda)
    val x1 = col(f1).cast("long").cast("double")
    val x2 = col(f2).cast("long").cast("double")
    val y = col(labelCol).cast("long").cast("double")
    val score = abs(floor(y -
      (lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2) + lit(0.5)).cast("long"))
    val scored = split.select(col(idCol), col("split"), score.as("score"))
    val cal = scored.where(col("split") === "cal").withColumn("__all", lit("all"))
    val nCal = cal.count()
    require(nCal > 0, "conformalD2 needs a non-empty calibration slice")
    val k = math.min(nCal,
      ((nCal + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen)
    val q = Sampling.stratumPrefixCum(cal, idCol, "__all", lit(1L),
        sortByScore = Some(col("score")), "__rank", salt + "r",
        partitions = 0, scoreAscending = true)
      .where(col("__rank") === k)
      .select(col("score")).head().getLong(0)
    val test = scored.where(col("split") === "test")
    val agg = test.agg(count(lit(1)).as("n_test"),
      sum((col("score") <= q).cast("long")).as("n_covered")).head()
    Seq((nFit, nCal, agg.getLong(0), q, agg.getLong(1)))
      .toDF("n_fit", "n_cal", "n_test", "q", "n_covered")
  }

  /** Mondrian (group-conditional) split-conformal: one shared model, a
    * SEPARATE conformal quantile per stratum — the fix for the failure
    * mode marginal conformal allows at corpus scale, where 90% overall
    * coverage can be 99% on English and 60% on the tail language (the
    * guarantee then holds PER GROUP, each stratum calibrated by its own
    * residuals; Vovk's Mondrian taxonomy with groups as categories).
    * Same machinery as [[conformalD2]] with the rank scan stratified:
    * per-stratum nearest-rank targets are driver-computed from the cal
    * counts (one row per stratum — bounded), the quantile VALUES come
    * from the shared two-phase prefix scan partitioned by stratum, and
    * coverage is counted per stratum on the untouched test slice. Strata
    * with an empty calibration slice emit no row (no quantile exists to
    * certify them — absent, never silently mis-covered). Emits one row
    * per stratum: `(stratum, n_cal, q, n_test, n_covered)`. */
  def conformalMondrianD2(df: DataFrame, idCol: String, strataCol: String,
                          f1: String, f2: String, labelCol: String,
                          alphaNum: Long = 1L, alphaDen: Long = 10L,
                          lambda: Double = 1.0,
                          salt: String = "conf"): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen,
      s"alpha must be a fraction in (0, 1), got $alphaNum/$alphaDen")
    val spark = df.sparkSession
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    val split = Sampling.assignSplit(clean, idCol,
      Seq("fit" -> 0.5, "cal" -> 0.25, "test" -> 0.25), salt)
      .localCheckpoint()
    val (_, w) = ridgeNormal(split.where(col("split") === "fit"),
      Seq(f1, f2), labelCol, lambda)
    val x1 = col(f1).cast("long").cast("double")
    val x2 = col(f2).cast("long").cast("double")
    val y = col(labelCol).cast("long").cast("double")
    val score = abs(floor(y -
      (lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2) + lit(0.5)).cast("long"))
    val scored = split.select(col(idCol), col(strataCol), col("split"),
      score.as("score"))
    val cal = scored.where(col("split") === "cal")
    val targets = cal.groupBy(strataCol).count().collect().map { r =>
      val c = r.getLong(1)
      org.apache.spark.sql.Row(r.get(0), c,
        math.min(c, ((c + 1) * (alphaDen - alphaNum) + alphaDen - 1) / alphaDen))
    }
    val tSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__t",
        df.schema(strataCol).dataType),
      org.apache.spark.sql.types.StructField("n_cal",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__k",
        org.apache.spark.sql.types.LongType)))
    val tdf = spark.createDataFrame(
      spark.sparkContext.parallelize(targets.toSeq, 1), tSchema)
    val ranked = Sampling.stratumPrefixCum(cal, idCol, strataCol, lit(1L),
      sortByScore = Some(col("score")), "__rank", salt + "r",
      partitions = 0, scoreAscending = true)
    val qs = ranked.join(broadcast(tdf),
        ranked(strataCol) <=> tdf("__t") && col("__rank") === col("__k"))
      .select(col(strataCol), col("n_cal"), col("score").as("q"))
    val test = scored.where(col("split") === "test")
    test.join(qs, strataCol)
      .groupBy(strataCol)
      .agg(first(col("n_cal")).as("n_cal"), first(col("q")).as("q"),
        count(lit(1)).as("n_test"),
        sum((col("score") <= col("q")).cast("long")).as("n_covered"))
  }

  /** Binary CLASSIFIER for two integer features — IRLS over the
    * ALGEBRAIC sigmoid `σ(t) = 1/2 + t/(2(1+|t|))` (the Elliott
    * activation): each iteration is ONE corpus aggregate reducing the
    * weighted normal equations to ten exact longs, then a driver 3×3
    * Cramer solve — k passes for k iterations, no per-row model state,
    * nothing data-sized on the driver. The "is this doc English / spam /
    * high-quality" trainer at corpus scale.
    *
    * Why the algebraic link and not `exp`: the two engines' `exp` differ
    * in final ulps, which would poison every downstream sum — σ and its
    * derivative here are rational IEEE ops only, so per-row weights are
    * bit-identical cross-engine. Per-row weighted contributions
    * (`s`, `s·x`, `s·x·x`, `s·z`-folded terms) quantize once to the 1e-6
    * grid and sum as LONGS — no float-sum order anywhere; the working
    * response enters as the bounded product `s·z = s·η + (y − μ)`, never
    * the unbounded `z` itself. Overflow contract: Σ s·x²·10⁶ < 2^63 —
    * holds to ~10^6 rows of 3000-char docs; rescale features past that.
    *
    * Returns `(n, weights(intercept, w1, w2), nCorrect)` — `nCorrect` =
    * training rows the final model classifies correctly at the 0.5
    * threshold (`η > 0`), an exact integer. λ regularizes the feature
    * diagonals in original units (scaled by 10⁶ internally to match the
    * grid). */
  def logisticElliottD2(df: DataFrame, f1: String, f2: String,
                        labelCol: String, iters: Int = 3,
                        lambda: Double = 1.0): (Long, Array[Double], Long) = {
    require(iters >= 1, s"need at least 1 iteration, got $iters")
    require(lambda >= 0.0, s"lambda must be >= 0, got $lambda")
    val x1 = col(f1).cast("long").cast("double")
    val x2 = col(f2).cast("long").cast("double")
    val y = col(labelCol).cast("long").cast("double")
    val clean = df.where(
      Seq(f1, f2, labelCol).map(col(_).isNotNull).reduce(_ && _))
    def q(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("long")
    var w = Array(0.0, 0.0, 0.0)
    var n = 0L
    var it = 0
    while (it < iters) {
      val eta = lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2
      val absT = abs(eta)
      val mu = lit(0.5) + eta / (lit(2.0) * (lit(1.0) + absT))
      val s = lit(1.0) / (lit(2.0) * ((lit(1.0) + absT) * (lit(1.0) + absT)))
      val sz = s * eta + (y - mu)
      val row = clean.agg(
        count(lit(1)).as("n"),
        sum(q(s)).as("m00"), sum(q(s * x1)).as("m01"), sum(q(s * x2)).as("m02"),
        sum(q(s * x1 * x1)).as("m11"), sum(q(s * x1 * x2)).as("m12"),
        sum(q(s * x2 * x2)).as("m22"),
        sum(q(sz)).as("b0"), sum(q(sz * x1)).as("b1"),
        sum(q(sz * x2)).as("b2")).head()
      n = row.getLong(0)
      require(n > 0, "logisticElliottD2 needs at least one complete row")
      val reg = lambda * 1e6
      val a = Array(
        Array(row.getLong(1).toDouble, row.getLong(2).toDouble,
          row.getLong(3).toDouble),
        Array(row.getLong(2).toDouble, row.getLong(4).toDouble + reg,
          row.getLong(5).toDouble),
        Array(row.getLong(3).toDouble, row.getLong(5).toDouble,
          row.getLong(6).toDouble + reg))
      val b = Array(row.getLong(7).toDouble, row.getLong(8).toDouble,
        row.getLong(9).toDouble)
      w = cramer3(a, b)
      it += 1
    }
    val etaF = lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2
    val nCorrect = clean.agg(
      sum(((etaF > lit(0.0)) === (y > lit(0.5))).cast("long"))).head().getLong(0)
    (n, w, nCorrect)
  }
}
