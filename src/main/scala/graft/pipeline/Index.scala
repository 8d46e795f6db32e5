package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing operators: the inverted (posting-list) shape that exact
  * phrase probes — decontamination, quotation tracing, exact-substring
  * search — run against at scale.
  *
  * Rebuild extension (the reference engine, tsne-flink, has no text surface
  * at all — SURVEY.md §2.3); this is the batch-index half of what
  * `TextOps.decontaminate` does as a join, materialized so many probe sets
  * can reuse one index build.
  *
  * Scale design (100 TB corpus):
  *  - The index key is an n-gram PHRASE, not a raw token: on natural (and
  *    especially on templated/web) text single tokens are Zipf-hot — the
  *    top token's posting list is O(corpus) and unusable — while n≥3 gram
  *    df distributions collapse toward 1 (measured on the fixture: token
  *    median df = 78% of docs, 3-gram median df = 1).
  *  - `maxDf` caps the posting lists that survive anyway (boilerplate,
  *    license headers): the cap is enforced AFTER partial aggregation, so
  *    a hot gram costs one shuffled row per (gram, doc), never a
  *    concatenated mega-posting, and the cap bounds every downstream
  *    probe join's per-key fan-out.
  *  - `minDf` drops singleton grams (df = 1) by default: they can never
  *    witness a cross-document collision, and on deduplicated corpora they
  *    are the overwhelming majority of the vocabulary (16 216 of 16 245
  *    grams on the sf0.01 fixture) — pruning them shrinks the index ~500×
  *    while keeping every gram a collision probe could hit. Set
  *    `minDf = 1` for a complete phrase-lookup index.
  *  - Two shuffles total, both on bounded keys: one (gram, doc) partial
  *    aggregate, one gram-keyed window for df. Positions are compacted
  *    per (gram, doc) into a sorted CSV — the posting row stays scalar,
  *    so the driver's hash compare and any columnar sink handle it.
  */
object Index {

  /** Build the phrase inverted index: one row per (gram, doc) with the
    * gram's corpus document frequency, per-doc term frequency, and the
    * sorted 0-based token offsets where the gram starts.
    *
    * Output columns: `gram, df, doc_id, tf, pos_csv`.
    */
  def phraseIndex(docs: DataFrame, n: Int = 3,
                  minDf: Long = 2, maxDf: Long = 1000): DataFrame = {
    require(n >= 1, s"gram width must be >= 1, got $n")
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    // spread the slim (doc_id, tokens) projection BEFORE the ~tokens-per-doc
    // explode: a small parquet scan is one partition, and fanning out on one
    // core serializes the gram assembly (the q_dedup_minhash lesson)
    val slim = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .repartition(parallelism)
    // gram assembly as one array-level codegen projection (no per-token
    // explode-then-self-join): gram i = tokens[i..i+n-1] joined by a single
    // space, exactly the oracle's position-join formulation. `sequence` is
    // guarded: size-n < 0 would produce a DESCENDING sequence, not empty.
    val gramsArr = when(size(col("toks")) >= n,
      expr(s"transform(sequence(0, size(toks) - $n)," +
        s" i -> concat_ws(' ', slice(toks, i + 1, $n)))"))
      .otherwise(expr("array()"))
    val posts = slim
      .select(col("doc_id"), posexplode(gramsArr).as(Seq("pos", "gram")))
    val perDoc = posts
      .groupBy(col("gram"), col("doc_id"))
      .agg(
        count(lit(1)).as("tf"),
        array_join(
          transform(sort_array(collect_list(col("pos"))), _.cast("string")),
          ",").as("pos_csv"))
    // df via an unordered gram-partition window: one shuffle, no self-join
    // (a groupBy-then-join-back would reshuffle the posting table twice)
    perDoc
      .withColumn("df", count(lit(1)).over(Window.partitionBy("gram")))
      .where(col("df").between(minDf, maxDf))
      .select(col("gram"), col("df"), col("doc_id"), col("tf"),
        col("pos_csv"))
  }

  /** Probe the index with a set of phrases: which documents contain any
    * probe gram, and where. A broadcast-sized probe set (the common
    * decontamination case: benchmark n-grams) never shuffles the index. */
  def probe(index: DataFrame, probes: DataFrame): DataFrame =
    index.join(broadcast(probes.select(col("gram")).distinct()), "gram")
      .select(col("gram"), col("doc_id"), col("tf"), col("pos_csv"))
}
