package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM-style tokenization: VITERBI MIN-COST segmentation over a
  * scored subword vocabulary — the inference rule of SentencePiece's
  * unigram model (Kudo 2018) and the third member of the tokenizer trio
  * ([[Bpe]] replays merges in learned order, [[Wordpiece]] always takes
  * the longest unit at the cursor, Unigram searches ALL segmentations by
  * dynamic programming and keeps the cheapest). The three genuinely
  * differ: greedy longest-match commits to a long first piece even when
  * it forces two rare pieces after it; Viterbi backtracks.
  *
  * Scoring here is frequency-derived and integer-exact rather than
  * EM-learned likelihood (the [[Wordpiece.learnVocab]] trade, made for
  * the same reason): `cost(u) = 64 − ilog2(count(u))` with
  * `ilog2(c) = len(bin(c)) − 1` — a quantized −log₂ p both engines
  * compute bit-identically (`bin` has no leading zeros in either), so
  * the whole DP is replayable in SQL. Every single character is in the
  * vocabulary (the byte-fallback convention), so every word segments.
  * Ties: the DP takes the MIN cost; backtracking takes the SMALLEST
  * piece length achieving it at each cursor — both deterministic.
  *
  * Scale shape, same as the other two: the Viterbi fold (HOF `aggregate`
  * over character positions building the best-cost array, then a
  * backpointer array, then a backward cursor walk — pure codegen
  * Columns, no UDF) runs ONCE PER DISTINCT WORD; the corpus side is an
  * explode + join against that vocabulary-bounded table + one per-doc
  * aggregate. Zipf's law turns ~10¹¹ per-occurrence DPs into ~10⁷
  * per-word ones at 100 TB. The model is collected driver-side
  * (alphabet + k units — model-sized, like k-means centroids) and rides
  * the plan as one map literal. */
object Unigram {

  /** Learn the scored vocabulary: ALL single characters plus the top-`k`
    * substrings of length 2..`maxLen` over distinct words, weighted by
    * corpus word frequency, ranked `(count desc, unit asc)`; score =
    * `64 − ilog2(count)` (smaller = cheaper = more frequent). A pure
    * function of the corpus — one explode + two hash aggregates + a
    * top-k. Returns `(unit, cost)` pairs driver-side. */
  def learnModel(docs: DataFrame, k: Int = 24,
                 maxLen: Int = 6): Seq[(String, Long)] = {
    require(k >= 1 && maxLen >= 2, s"bad model params ($k, $maxLen)")
    val tok = col("tok")
    val subs = flatten(transform(
      sequence(lit(1), least(lit(maxLen), length(tok))),
      l => transform(sequence(lit(1), length(tok) - l + 1),
        i => call_function("substring", tok, i, l))))
    val uc = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(explode(subs).as("unit"), col("c"))
      .groupBy("unit").agg(sum("c").as("cnt"))
    val cost = (lit(64L) - (length(bin(col("cnt"))) - 1)).as("cost")
    val singles = uc.where(length(col("unit")) === 1)
      .select(col("unit"), cost)
    val multis = uc.where(length(col("unit")) >= 2)
      .orderBy(col("cnt").desc, col("unit").asc).limit(k)
      .select(col("unit"), cost)
    singles.unionAll(multis).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Viterbi segmentation of every token against the scored `model`,
    * reduced per doc: `(doc_id, n_tokens, n_uni_tokens, uni_cost,
    * seg_sig)` — piece count, summed best cost, and the order-free
    * mod-sum of each occurrence's segmented string's
    * [[Hashing.hash60]] (mod 1e9+7), pinning the exact piece sequence
    * of every word. Docs with no tokens report zeros. The model must
    * contain every character of the corpus (as [[learnModel]]'s does)
    * or the in-plan array_min raises on the uncovered word. */
  def segment(docs: DataFrame, model: Seq[(String, Long)],
              maxLen: Int = 6): DataFrame = {
    require(model.nonEmpty && model.forall(_._1.length <= maxLen),
      s"model units must be non-empty with length <= $maxLen")
    val costMap = typedlit(model.toMap)
    val tok = col("tok")
    def pieceCost(start: Column, l: Column): Column =
      element_at(costMap, call_function("substring", tok, start, l))

    // forward DP: bests[i+1] = min cost of segmenting the i-char prefix
    // (1-based array, bests[1] = 0); candidates are the <= maxLen
    // in-vocab pieces ENDING at i, absent pieces drop out as nulls
    val bests = aggregate(
      sequence(lit(1), length(tok)),
      array(lit(0L)),
      (acc, i) => array_append(acc, array_min(filter(
        transform(sequence(lit(1), least(lit(maxLen), i)),
          l => element_at(acc, i - l + 1) + pieceCost(i - l + 1, l)),
        x => x.isNotNull))))

    // backpointer per position: the SMALLEST piece length achieving the
    // optimum (the deterministic tie rule both engines replay)
    val bpArr = transform(sequence(lit(1), length(tok)), i =>
      array_min(filter(
        transform(sequence(lit(1), least(lit(maxLen), i)), l =>
          when(element_at(col("bests"), i + 1) ===
            element_at(col("bests"), i - l + 1) + pieceCost(i - l + 1, l),
            l)),
        x => x.isNotNull)))

    // backward cursor walk: at most len(tok) hops, each consuming the
    // chosen piece and prepending it (so no reverse pass is needed)
    val segCol = aggregate(
      sequence(lit(1), length(tok)),
      struct(length(tok).as("pos"), lit("").as("seg")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val l = element_at(col("bp"), pos)
        when(pos > 0,
          struct((pos - l).as("pos"),
            concat(call_function("substring", tok, pos - l + 1, l),
              when(acc.getField("seg") === "", lit(""))
                .otherwise(lit(" ")),
              acc.getField("seg")).as("seg")))
          .otherwise(acc)
      },
      acc => acc.getField("seg"))

    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val perWord = toks.select("tok").distinct()
      .select(tok, bests.as("bests"))
      .select(tok, col("bests"), bpArr.as("bp"))
      .select(tok, col("bests"), segCol.as("seg"))
      .select(tok,
        size(split(col("seg"), " ")).cast("long").as("n_sub"),
        element_at(col("bests"), length(tok) + 1).as("cost"),
        (Hashing.hash60(col("seg")) % 1000000007L).as("sig"))
    val perDoc = toks.join(perWord, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("n_sub").as("n_uni_tokens"),
        sum("cost").as("uni_cost"),
        sum("sig").as("seg_sig"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_uni_tokens"), lit(0L)).as("n_uni_tokens"),
        coalesce(col("uni_cost"), lit(0L)).as("uni_cost"),
        coalesce(col("seg_sig"), lit(0L)).as("seg_sig"))
  }
}
