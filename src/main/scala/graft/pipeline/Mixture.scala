package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain mixture-weight solving — DoReMi-lite (Xie et al. 2023): the
  * step after corpus curation where a pipeline decides HOW MUCH of each
  * domain to sample into the training blend. DoReMi runs group-DRO on a
  * proxy model and nudges domain weights up where excess loss is high
  * (multiplicative weights / Hedge); this operator is the deterministic
  * integer-exact core of that loop with the per-domain loss signal taken
  * as INPUT (any integer hardness proxy drops in — a real deployment
  * feeds proxy-model losses; the driver row feeds a bytes-per-token
  * compression proxy).
  *
  * Update, all integer so the DuckDB oracle replays it bit-for-bit
  * (Spark's `div` and DuckDB's `//` both truncate toward zero, the
  * [[graft.ops.Graph]] fixed-point discipline):
  *   mean_t  = (Σ w·loss) div (Σ w)                (weighted mean, 1 row)
  *   mult(d) = clamp(SCALE + ((loss(d) − mean_t)·ηnum) div ηden,
  *                   1, 2·SCALE)                   (linearized exp(η·excess))
  *   u(d)    = (w(d)·mult(d)) div SCALE
  *   w'(d)   = (u(d)·SCALE) div (Σ u)              (L1 re-normalize)
  * The exp() of true Hedge is linearized — the standard small-η
  * approximation — because exp is not integer-replayable; the clamp
  * bounds the factor to [1e-6, 2] per round.
  *
  * Scale shape: the weights table is |domains|-sized (tiny); each round
  * is one 1-row aggregate broadcast back + one narrow map, `rounds`
  * supersteps total, lineage cut per round — the PageRank discipline.
  * The corpus-scale work (reducing per-doc losses to per-domain) happens
  * BEFORE this operator, as one map-side-combinable aggregation. */
object Mixture {

  /** Solve mixture weights over `losses(domain, loss_u)`. Returns
    * `(domain, loss_u, weight_u)` with weights in `scale` units summing
    * to ≤ `scale` (integer-division truncation only). */
  def mixtureWeights(losses: DataFrame, rounds: Int = 5,
                     scale: Long = 1000000L,
                     etaNum: Long = 1L, etaDen: Long = 4L): DataFrame = {
    require(rounds >= 1 && scale > 0 && etaNum > 0 && etaDen > 0,
      s"bad mixture params (rounds=$rounds, scale=$scale, eta=$etaNum/$etaDen)")
    val div = (a: Column, b: Column) => call_function("div", a, b)
    val base = losses.select(col("domain"), col("loss_u").cast("long"))
      .localCheckpoint()
    val nD = base.count()
    require(nD > 0, "mixtureWeights needs at least one domain")
    // with nD > scale the initial weight scale/nD truncates to 0 for
    // EVERY domain and the weighted mean's divisor goes to 0 — refuse
    // up front rather than emit all-null weights
    require(nD <= scale,
      s"mixtureWeights needs nDomains <= scale, got $nD > $scale " +
        "(raise scale so per-domain weights stay >= 1)")
    // Σ w·loss ≤ scale·max(loss) because Σ w ≤ scale — one tiny bounds
    // job keeps every product provably inside a long
    val Array(lo, hi) = base.agg(min("loss_u"), max("loss_u")).head() match {
      case r => Array(r.getLong(0), r.getLong(1))
    }
    require(lo >= 0L && hi <= Long.MaxValue / scale,
      s"loss_u must be in [0, ${Long.MaxValue / scale}], got [$lo, $hi]")
    var w = base.select(col("domain"), col("loss_u"),
      lit(scale / nD).as("w"))
    for (_ <- 1 to rounds) {
      val stats = w.agg(sum("w").as("sw"),
        sum(col("w") * col("loss_u")).as("swl"))
      // guarded like the re-normalize divisor below: sw=0 is unreachable
      // while nD <= scale holds (the max-u domain re-normalizes to
      // w >= scale/nD >= 1 every round), but an unguarded div would turn
      // any future drift into silent NULL weights vs a DuckDB crash —
      // engine divergence, the worst failure mode
      val mean = div(col("swl"), greatest(col("sw"), lit(1L)))
      val mult = greatest(lit(1L), least(lit(2 * scale),
        lit(scale) + div((col("loss_u") - mean) * etaNum, lit(etaDen))))
      val up = w.crossJoin(broadcast(stats))
        .select(col("domain"), col("loss_u"),
          div(col("w") * mult, lit(scale)).as("u"))
      val tot = up.agg(sum("u").as("tu"))
      w = up.crossJoin(broadcast(tot))
        .select(col("domain"), col("loss_u"),
          div(col("u") * scale, greatest(col("tu"), lit(1L))).as("w"))
        .localCheckpoint()
    }
    w.select(col("domain"), col("loss_u"), col("w").as("weight_u"))
  }
}
