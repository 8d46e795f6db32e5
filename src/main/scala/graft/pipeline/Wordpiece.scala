package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenization: GREEDY LONGEST-MATCH segmentation over
  * a learned subword vocabulary — the inference rule of BERT's tokenizer
  * (Devlin et al. 2019) and the counterpart of [[Bpe]]'s merge-order
  * segmentation (the two genuinely differ: BPE replays merges in learned
  * order, WordPiece always takes the longest vocab unit at the cursor).
  *
  * Vocabulary learning here is frequency-based (top-k substrings of
  * length 2..maxLen weighted by word frequency, ties broken by unit
  * string) rather than the likelihood objective real WordPiece training
  * uses — deterministic, one corpus pass, and SQL-replayable, which is
  * what the oracle needs; the segmentation rule, the actual operator, is
  * exact. Single characters are implicitly always in the vocabulary, so
  * no `[UNK]` arises (a byte-fallback vocab, as GPT-style tokenizers
  * use). The `##` continuation prefix is presentation only and omitted.
  *
  * Scale shape, same as [[Bpe.segment]]: the greedy fold (a HOF
  * `aggregate` over character positions — pure codegen Columns, no UDF)
  * runs ONCE PER DISTINCT WORD; the corpus-scale side is an explode +
  * join against that vocabulary-bounded table + one per-doc aggregate.
  * Zipf's law turns ~10¹¹ per-occurrence folds into ~10⁷ per-word ones
  * at 100 TB. Vocab learning is one explode (≤ maxLen·|word| units per
  * distinct word) + a map-side-combinable hash aggregate + a top-k. */
object Wordpiece {

  /** Learn the top-`k` subword units: all substrings of length
    * 2..`maxLen` over distinct words, weighted by corpus word frequency,
    * ranked `(count desc, unit asc)` — a pure function of the corpus.
    * Returns units driver-side (model-sized, like k-means centroids). */
  def learnVocab(docs: DataFrame, k: Int = 24, maxLen: Int = 6): Seq[String] = {
    require(k >= 1 && maxLen >= 2, s"bad vocab params ($k, $maxLen)")
    val tok = col("tok")
    val subs = when(length(tok) >= 2,
      flatten(transform(sequence(lit(2), least(lit(maxLen), length(tok))),
        l => transform(sequence(lit(1), length(tok) - l + 1),
          i => call_function("substring", tok, i, l)))))
      .otherwise(array().cast("array<string>"))
    docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(explode(subs).as("unit"), col("c"))
      .groupBy("unit").agg(sum("c").as("cnt"))
      .orderBy(col("cnt").desc, col("unit").asc)
      .limit(k)
      .collect().map(_.getString(0)).toSeq
  }

  /** Greedy longest-match segmentation of every token against `vocab`,
    * reduced per doc: `(doc_id, n_tokens, n_wp_tokens, seg_sig)` where
    * `seg_sig` is the order-free mod-sum of each occurrence's segmented
    * string's [[Hashing.hash60]] (mod 1e9+7 so a long sum cannot
    * overflow) — it pins the exact piece sequence of every word, not
    * just the piece counts. Docs with no tokens report `(0, 0, 0)`. */
  def segment(docs: DataFrame, vocab: Seq[String],
              maxLen: Int = 6): DataFrame = {
    require(vocab.forall(u => u.length >= 2 && u.length <= maxLen),
      s"vocab units must have length in [2, $maxLen]")
    val byLen = vocab.groupBy(_.length)
    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val tok = col("tok")
    // longest vocab unit starting at 1-based position i; 1 = the
    // single-char fallback. Built longest-first, so the when-chain IS
    // the longest-match rule.
    def matchLen(i: Column): Column =
      (2 to maxLen).foldLeft(lit(1): Column) { (shorter, len) =>
        byLen.get(len) match {
          case Some(us) =>
            when(call_function("substring", tok, i, lit(len))
              .isin(us: _*), lit(len)).otherwise(shorter)
          case None => shorter
        }
      }
    // the greedy cursor as a fold over character positions: positions
    // the previous match consumed are skipped (i < pos), each match
    // appends its piece and advances the cursor by its length
    val segmented = aggregate(
      sequence(lit(1), length(tok)),
      struct(lit(1).as("pos"), lit("").as("seg")),
      (acc, i) => {
        // match length bound once INSIDE the cursor branch (the raw
        // spelling evaluated the whole longest-match when-chain twice
        // per active position — for the cursor advance and the piece
        // substring; skipped positions still evaluate nothing)
        when(i === acc.getField("pos"),
          TextOps.bindOnce(matchLen(i)) { l =>
            struct((acc.getField("pos") + l).as("pos"),
              concat(acc.getField("seg"), lit(" "),
                call_function("substring", tok, i, l)).as("seg"))
          })
          .otherwise(acc)
      },
      acc => trim(acc.getField("seg")))
    val perWord = toks.select("tok").distinct()
      .select(col("tok"), segmented.as("seg"))
      .select(col("tok"),
        size(split(col("seg"), " ")).cast("long").as("n_sub"),
        (Hashing.hash60(col("seg")) % 1000000007L).as("sig"))
    val perDoc = toks.join(perWord, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("n_sub").as("n_wp_tokens"),
        sum("sig").as("seg_sig"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_wp_tokens"), lit(0L)).as("n_wp_tokens"),
        coalesce(col("seg_sig"), lit(0L)).as("seg_sig"))
  }
}
