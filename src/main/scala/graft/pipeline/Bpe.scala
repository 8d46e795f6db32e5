package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding vocabulary learning (Sennrich et al. 2016) — the
  * tokenizer-training stage of an LLM data pipeline, in the shape real
  * trainers use at corpus scale: ONE pass over the corpus reduces it to
  * the distinct-word count table (shuffle ∝ vocabulary, map-side
  * combinable), and every merge iteration then runs on that vocab-sized
  * table only — pair counting is a hash aggregate over distinct words
  * weighted by their corpus counts, never a rescan of the text.
  *
  * Words are represented as space-joined character symbols with a
  * terminal `</w>` marker (the paper's representation); a merge rewrites
  * every word via two left-to-right `replace` passes over the
  * space-padded form — two passes are exactly enough because a skipped
  * occurrence (leading space consumed by the preceding match) is always
  * followed by a merged token that restores its delimiters, and the same
  * double-`replace` spelling runs identically in any SQL engine, which
  * is what makes the merge table oracle-checkable. Ties on pair count
  * break by `(left, right)` ascending, so the learned vocabulary is a
  * pure function of the corpus.
  *
  * Driver traffic: one `(left, right, count)` row per merge round —
  * nothing else leaves the cluster. Each round's words table is
  * `localCheckpoint`ed so plan depth stays flat across rounds (the same
  * lineage-cut discipline as the PageRank / connected-components loops).
  *
  * Not a reference port: the reference engine (tsne-flink) has no text
  * surface (SURVEY.md §2.3). */
object Bpe {

  /** Space-joined character symbols of `tok`, plus the terminal marker:
    * `"low"` → `"l o w </w>"`. Spelled with a substring loop (not a
    * regex lookahead split) so the oracle can reproduce it in RE2-based
    * engines; `call_function` keeps it usable inside nested lambdas. */
  private def symExpr(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(
      array_join(
        transform(sequence(lit(1), length(tok)),
          i => call_function("substring", tok, i, lit(1))),
        " "),
      lit(" </w>"))

  /** Learn the first `nMerges` BPE merges from the corpus.
    * Returns `(step, left, right, pair_count)`, `step` 1-based in merge
    * order. Stops early (fewer rows) if no pair occurs twice. */
  def learnMerges(docs: DataFrame, nMerges: Int,
                  minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    val parallelism = spark.sessionState.conf.numShufflePartitions
    // the one corpus-scale pass: distinct words + counts, then the symbol
    // representation (a pure projection on the vocab-sized result)
    var words = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .repartition(parallelism, col("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .select(symExpr(col("tok")).as("sym"), col("c"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // adjacent symbol pairs over distinct words, weighted by corpus count
      val s = split(col("sym"), " ")
      val idxs = when(size(s) >= 2, sequence(lit(0), size(s) - 2))
        .otherwise(array().cast("array<int>"))
      val pairs = words
        .select(explode(transform(idxs,
            i => struct(element_at(s, i + 1).as("l"),
              element_at(s, i + 2).as("r")))).as("p"), col("c"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum("c").as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((step, l, r, cnt))
        val pat = s" $l $r "
        val rep = s" $l$r "
        val padded = concat(lit(" "), col("sym"), lit(" "))
        words = words
          .select(
            trim(call_function("replace",
              call_function("replace", padded, lit(pat), lit(rep)),
              lit(pat), lit(rep))).as("sym"),
            col("c"))
          .localCheckpoint()
        step += 1
      }
    }
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map { case (st, l, r, c) => Row(st.toLong, l, r, c) }, 1),
      schema)
  }

  /** Segment with a learned merge list — the inference side of BPE.
    * The merge chain (char split + 2·|merges| `replace` passes, O(len²)
    * string work per input) runs ONCE PER DISTINCT WORD, not per
    * occurrence: tokenizer inference is vocabulary-bounded by Zipf's law,
    * so the corpus-scale side is only an explode + a join against the
    * vocab-sized `(word, n_sub)` table + a per-doc sum. At a skewed 100 TB
    * corpus that turns ~10¹¹ merge-chain evaluations into ~10⁷.
    * Returns `(doc_id, n_tokens, n_bpe_tokens)` (docs with no tokens:
    * `(0, 0)`). */
  def segment(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val merged = merges.foldLeft(
        concat(lit(" "), symExpr(col("tok")), lit(" "))) {
      case (acc, (l, r)) =>
        val pat = lit(s" $l $r ")
        val rep = lit(s" $l$r ")
        call_function("replace", call_function("replace", acc, pat, rep),
          pat, rep)
    }
    val vocab = toks.select(col("tok")).distinct()
      .select(col("tok"), size(split(trim(merged), " ")).cast("long").as("n_sub"))
    val perDoc = toks.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("n_sub").as("n_bpe_tokens"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** The GPT-2 pre-tokenization split (Radford et al. 2019; the regex
    * every byte-level BPE — GPT-2/3, RoBERTa, CLIP — applies BEFORE the
    * merge loop, so merges can never cross character classes):
    * contraction suffixes, space-prefixed letter runs, space-prefixed
    * digit runs, space-prefixed punctuation runs, whitespace runs — in
    * that alternation order, so `don't` splits `don` + `'t` and ` 42nd`
    * splits ` 42` + `nd`. This is the LOOKAHEAD-FREE variant: the
    * original's `\s+(?!\S)` trailing-space alternative is dropped
    * (RE2-class engines — and therefore the cross-engine oracle — have
    * no lookahead), so a whitespace run stays one piece instead of
    * donating its last space to the next token. Segmentation is still
    * lossless: pieces concatenate back to the input exactly. */
  val PretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All pre-token pieces of `text`, in order — one
    * `regexp_extract_all`, a zero-shuffle narrow map. The downstream
    * BPE merge loop runs once per DISTINCT piece (Zipf-bounded), which
    * is exactly why the pre-split exists at corpus scale. */
  def pretokenize(text: Column): Column =
    regexp_extract_all(text, lit(PretokenPattern), lit(0))
}
