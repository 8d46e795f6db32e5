package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** Deduplication operators over the `documents` table — exact, n-gram
  * Jaccard, MinHash+LSH and SimHash. The four standard tiers of a
  * web-scale corpus dedup stage, each with a different cost/recall point:
  *
  *   - exact: one hash aggregation — O(N);
  *   - Jaccard similarity join: explode to (doc, shingle), self-join on
  *     shingle, count — exact pairwise scores but cost ∝ Σ df(shingle)²;
  *   - MinHash+LSH: constant-size signatures, band-bucket join — the
  *     100 TB path: no all-pairs anywhere, shuffle ∝ N·bands, and the
  *     verify step touches only bucket-collision candidates;
  *   - SimHash: one 60-bit signature per doc; near-dups differ in ≤ a few
  *     bits, found by banded exact-match blocking.
  *
  * All shingle/token hashing uses [[Hashing.hash60]], so every stage is
  * reproducible in the DuckDB oracle.
  */
object Dedup {

  // ---------------- shingling ------------------------------------------

  /** Token `n`-gram shingle table: `(doc_id, [pos,] sh_hash)`, distinct per
    * doc when positions are dropped. Docs with < n tokens produce no rows
    * (nothing to compare). Pure array expressions — one narrow projection. */
  def shingles(docs: DataFrame, n: Int = 3, keepPos: Boolean = false,
               carry: Seq[String] = Nil): DataFrame = {
    // materialize the token array into its own projection first: a lambda
    // that references the raw split(...) expression re-evaluates the regex
    // split on every element_at inside the transform (3n× per shingle) —
    // an attribute reference reads the array once.
    // repartition first: the tokenize+hash explode is the CPU hot spot of
    // every shingle consumer, and a small-file scan would run it all on
    // one core; shuffling the slim 1× doc projection is strictly cheaper
    // than the ~tokens× wider exchanges downstream aggregations do anyway
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    val carryCols = carry.map(col)
    val tokenized = docs.select(col("doc_id") +: col("text") +: carryCols: _*)
      .repartition(parallelism)
      .select(col("doc_id") +: TextOps.tokens(col("text")).as("t") +: carryCols: _*)
    val t = col("t")
    // guard: sequence(0, x) with x < 0 generates a *descending* sequence
    val idxs = when(size(t) >= n, sequence(lit(0), size(t) - n))
      .otherwise(array().cast("array<int>"))
    val grams = transform(idxs,
      i => Hashing.hash60(
        concat_ws(" ", (0 until n).map(o => element_at(t, i + o + 1)): _*)))
    val exploded = tokenized
      .select(col("doc_id") +: posexplode(grams).as(Seq("pos", "sh_hash")) +: carryCols: _*)
    if (keepPos) exploded
    else exploded.select("doc_id", "sh_hash").distinct()
  }

  /** N-gram novelty of a candidate batch against a reference corpus: per
    * batch document, the fraction of its distinct shingles NOT present
    * anywhere in the corpus — the data-valuation / crawl-prioritization
    * signal ("is this new text or re-crawl paraphrase"), the additive
    * complement of the dedup family (dedup asks "is this a copy of ONE
    * doc"; novelty asks "how much of this exists ANYWHERE").
    *
    * Shape: two shingle tables joined by hash — a left-semi equi-join
    * co-partitioned on `sh_hash` (never an all-pairs form), then two
    * doc-keyed counts. The ratio is two integer operands under one IEEE
    * division, exact cross-engine. Batch shingles are materialized (localCheckpoint) across
    * their two consumers. Documents shorter than `n` tokens have no
    * shingles and emit no row. */
  def noveltyVsCorpus(batch: DataFrame, corpus: DataFrame,
                      n: Int = 3): DataFrame = {
    val b = shingles(batch, n).localCheckpoint()
    val corpusSh = shingles(corpus, n).select("sh_hash").distinct()
    val seen = b.join(corpusSh, Seq("sh_hash"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_seen"))
    b.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .join(seen, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        round((col("n_sh") - coalesce(col("n_seen"), lit(0L))).cast("double")
          / col("n_sh"), 6).as("novelty_r"))
  }

  /** Distinct-shingle count per doc (the |A| term of Jaccard). */
  private def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

  // ---------------- exact dedup ----------------------------------------

  /** Exact dedup: canonical id = min doc_id per content hash. One hash
    * aggregation + one broadcast-friendly join back; no N² anywhere. */
  def exactCanonical(docs: DataFrame): DataFrame =
    exactCanonicalBy(docs, col("text"))

  /** [[exactCanonical]] over an arbitrary content expression — e.g.
    * `TextOps.normalizeText(col("text"))` for case/punctuation/whitespace-
    * insensitive "fuzzy-exact" dedup, or a concat of several columns for
    * composite identity. Same one-hash-aggregation shape. */
  def exactCanonicalBy(docs: DataFrame, content: org.apache.spark.sql.Column): DataFrame = {
    val hashed = docs.select(col("doc_id"), Hashing.hash60(content).as("h"))
    val canon = hashed.groupBy("h").agg(min("doc_id").as("canon_id"))
    hashed.join(canon, "h").select(col("doc_id"), col("canon_id"))
  }

  /** Incremental exact dedup — THE production dedup shape: a batch of new
    * documents filtered against an existing corpus (keep only docs whose
    * content hash is unseen). A `left_anti` join on the content hash: when
    * the corpus hash set fits the broadcast threshold it is a map-local
    * probe with zero shuffle of the new side; past it Spark plans a
    * shuffled anti join — either way nothing is ever materialized per
    * match, and at 100 TB the corpus side is one slim 8-byte-hash column,
    * not the corpus. (Intra-batch duplicates are kept — first-seen
    * semantics within a batch is [[exactCanonical]]'s job; compose both
    * for full ingest dedup.) */
  def exactIncremental(newDocs: DataFrame, corpus: DataFrame): DataFrame = {
    val corpusHashes = corpus.select(Hashing.hash60(col("text")).as("h")).distinct()
    newDocs.withColumn("h", Hashing.hash60(col("text")))
      .join(corpusHashes, Seq("h"), "left_anti")
      .drop("h")
  }

  // ---------------- exact n-gram Jaccard similarity join ----------------

  /** All pairs with Jaccard(shingles) ≥ θ, via the sparse similarity join:
    * self-join the (doc, shingle) table on shingle with `i < j`, count
    * intersections, look up set sizes. No cartesian product — cost is
    * Σ over shingles of df², which is near-linear when shingles are rare
    * (n-grams are). For skewed corpora, cap df first ([[withDfCap]]). */
  def jaccardPairs(docs: DataFrame, n: Int = 3, theta: Double = 0.5): DataFrame = {
    val sh = shingles(docs, n)
    jaccardOfShingles(sh, theta)
  }

  /** Exact Jaccard from a shingle table — over all `i < j` pairs sharing a
    * shingle, or restricted to a `(i, j)` candidate set when given (the
    * MinHash verify path; one formula, one implementation). */
  private[pipeline] def jaccardOfShingles(sh: DataFrame, theta: Double,
                                          candidates: Option[DataFrame] = None): DataFrame = {
    // Candidate-path pre-filter history. Round 13 tried the guide-§3.2
    // reduction as a candidate-doc SEMI-JOIN with its own checkpoint
    // barriers and measured it 2.5× WORSE (4.6 vs 1.8 s, q_dedup_minhash
    // at sf0.1) — the barriers beat the saved exchanges. Round 14
    // implements the technique AS WRITTEN instead: a driver-built Bloom
    // over the candidate doc ids, applied MAP-SIDE to the shingle table
    // (a codegen'd getbit chain — no join node, no extra exchange, no
    // barrier beyond the candidate materialization the collect needs
    // anyway), so the sizes aggregate and both verify-join probes shuffle
    // only candidate-doc shingle rows instead of the whole corpus's.
    // False positives only add rows the inner joins drop; a Bloom has no
    // false negatives and keeps EVERY row of a true candidate doc, so
    // the per-doc shingle counts stay exact — output unchanged.
    val (inter, sizes) = candidates match {
      case None =>
        val i0 = sh.as("a")
          .join(sh.as("b"), col("a.sh_hash") === col("b.sh_hash") &&
            col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
          .agg(count(lit(1)).as("c"))
        (i0, shingleSizes(sh))
      case Some(cands0) =>
        // materialized: consumed by the Bloom-build collect AND the join
        // (lazy, the banded candidate subtree would execute twice)
        val cands = cands0.localCheckpoint()
        val ids = cands
          .select(explode(array(col("i"), col("j"))).as("d")).distinct()
          .collect().map(r => Bloom.mix64(r.getLong(0)))
        val bits = Bloom.build(ids)
        val shF = sh.where(Bloom.mightContain(bits, Bloom.mix64(col("doc_id"))))
        val i0 = cands
          .join(shF.select(col("doc_id").as("i"), col("sh_hash")), "i")
          .join(shF.select(col("doc_id").as("j"), col("sh_hash")), Seq("j", "sh_hash"))
          .groupBy("i", "j").agg(count(lit(1)).as("c"))
        (i0, shingleSizes(shF))
    }
    inter
      .join(sizes.select(col("doc_id").as("i"), col("n_sh").as("ni")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n_sh").as("nj")), "j")
      .select(col("i"), col("j"),
        (col("c").cast("double") / (col("ni") + col("nj") - col("c"))).as("jaccard"))
      .where(col("jaccard") >= theta)
  }

  /** Optional skew guard: drop shingles appearing in more than `cap` docs
    * (stopword-grams carry no dedup signal but quadratic join cost). */
  def withDfCap(sh: DataFrame, cap: Int): DataFrame = {
    val rare = sh.groupBy("sh_hash").agg(count(lit(1)).as("df"))
      .where(col("df") <= cap).select("sh_hash")
    sh.join(rare, "sh_hash")
  }

  // ---------------- MinHash + LSH --------------------------------------

  /** Seeded affine MinHash family over 31-bit shingle hashes:
    * h_k(x) = (a_k·x + b_k) mod (2³¹−1). 31-bit domain keeps a_k·x inside
    * a signed 64-bit product. */
  final case class MinHashFamily(seed: Long, numHashes: Int) {
    private val P = 2147483647L // 2^31 − 1
    val (as, bs) = {
      val rnd = new Random(seed)
      (Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
        Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong))
    }
    /** Fold one shingle hash into a running signature, in place. */
    def update(s: Array[Long], h: Long): Unit = {
      val x = h & 0x7FFFFFFFL
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * x + bs(k)) % P
        if (v < s(k)) s(k) = v
        k += 1
      }
    }
    def sig(shingleHashes: Iterator[Long]): Array[Long] = {
      val s = Array.fill(numHashes)(Long.MaxValue)
      shingleHashes.foreach(update(s, _))
      s
    }
  }

  /** MinHash as a typed `Aggregator`: the signature is a semigroup under
    * elementwise min, so Spark runs it with *partial aggregation* — each
    * map task folds its local shingles into one 128-long buffer per doc
    * and the shuffle carries signatures, not shingle rows. (The
    * `groupByKey.mapGroups` formulation shuffles every shingle.) */
  final class MinHashAggregator(fam: MinHashFamily)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(fam.numHashes)(Long.MaxValue)
    override def reduce(b: Array[Long], h: Long): Array[Long] = { fam.update(b, h); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var k = 0
      while (k < a.length) { if (b(k) < a(k)) a(k) = b(k); k += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Near-duplicate pairs by MinHash + banded LSH, exact-verified:
    * `bands` bands of `rowsPerBand` minhashes each; docs colliding in any
    * band become candidates; candidates are re-scored with the *exact*
    * shingle Jaccard and filtered at θ. With r=2, b=64 the probability of
    * missing a pair at s=0.7 is (1−0.49)⁶⁴ ≈ 1e−19 — the output is the
    * exact ≥θ pair set with overwhelming probability, which is what the
    * DuckDB oracle checks. Shuffles: shingles (N·s rows), signatures
    * (N·bands rows), candidate verify (candidates only). No all-pairs. */
  def minHashNearDups(docs: DataFrame, n: Int = 3, theta: Double = 0.7,
                      bands: Int = 64, rowsPerBand: Int = 2,
                      seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fam = MinHashFamily(seed, bands * rowsPerBand)
    // localCheckpoint, not persist: the shingle table is referenced FOUR
    // times downstream (signatures, sizes, both verify sides), and with a
    // lazy lineage each referencing action re-plans the shingle expression
    // tree — measured ~3 s of pure driver planning per action on this
    // pipeline's plans. The checkpoint evaluates the narrow map once and
    // every consumer plans against a 2-column leaf; blocks are freed by
    // the ContextCleaner when the returned frame is dropped, so nothing
    // leaks per call. (Cost: the call is now eager — the right trade for
    // a table consumed 4x by construction.)
    val sh = shingles(docs, n).localCheckpoint()
    val banded = bandKeysOf(sh, fam, bands, rowsPerBand)

    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()

    // exact verify on candidates only — same formula as the full join
    jaccardOfShingles(sh, theta, candidates = Some(cands))
  }

  /** Banded signature table `(doc_id, band, bkey)` of a shingle table:
    * typed Aggregator → HashAggregate with map-side partial signatures;
    * band key = (band index, the band's minhash rows) — struct equality is
    * exactly "collides in this band". */
  private def bandKeysOf(sh: DataFrame, fam: MinHashFamily, bands: Int,
                         rowsPerBand: Int): DataFrame = {
    val sigs = sh
      .groupBy("doc_id")
      .agg(udaf(new MinHashAggregator(fam),
        org.apache.spark.sql.Encoders.scalaLong)(col("sh_hash")).as("sig"))
    val bandStructs = array((0 until bands).map(b =>
      struct((0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1).as(s"h$r")): _*)): _*)
    sigs.select(col("doc_id"), posexplode(bandStructs))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
  }

  /** The corpus's MinHash band keys as a standalone table — the SIGNATURE
    * STORE a production ingest pipeline persists between crawls (parquet
    * keyed by (band, bkey)): ~`bands` small rows per corpus doc, so
    * probing a new batch never touches corpus text except to exact-verify
    * the few candidate docs LSH surfaces. Parameters must match the ones
    * later probes use — the store is only meaningful under the same
    * (n, bands, rowsPerBand, seed). */
  def signatureStore(docs: DataFrame, n: Int = 3, bands: Int = 64,
                     rowsPerBand: Int = 2, seed: Long = 42L): DataFrame =
    bandKeysOf(shingles(docs, n), MinHashFamily(seed, bands * rowsPerBand),
      bands, rowsPerBand)

  /** Incremental near-duplicate detection — the MinHash twin of
    * [[exactIncremental]]: find every (corpus doc, new doc) pair with
    * shingle Jaccard ≥ θ, WITHOUT recomputing anything corpus×corpus.
    * The new batch's band keys probe the corpus signature store (pass the
    * persisted table via `corpusStore`; omitted, it is computed from
    * `corpus` — correct but paying the store build this call); candidates
    * are exact-verified with [[jaccardOfShingles]], touching corpus TEXT
    * only for candidate docs (a semi join the parquet reader turns into
    * an id-pushdown scan). Only cross pairs are emitted — intra-batch
    * near-dups are [[minHashNearDups]]'s job on the batch alone. Returns
    * `(i, j, jaccard)` with i < j; ids must be unique across
    * corpus ∪ batch. Shuffle ∝ batch·bands + candidates — nothing scales
    * with corpus size but the store probe itself. */
  def minHashIncremental(newDocs: DataFrame, corpus: DataFrame,
                         corpusStore: Option[DataFrame] = None,
                         n: Int = 3, theta: Double = 0.7,
                         bands: Int = 64, rowsPerBand: Int = 2,
                         seed: Long = 42L): DataFrame = {
    val fam = MinHashFamily(seed, bands * rowsPerBand)
    val newSh = shingles(newDocs, n).localCheckpoint()
    val newBands = bandKeysOf(newSh, fam, bands, rowsPerBand)
    val store = corpusStore.getOrElse(
      signatureStore(corpus, n, bands, rowsPerBand, seed))
    // store side × batch side: every candidate is a cross pair by
    // construction (no corpus×corpus, no batch×batch)
    val cands0 = store.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("cid"), col("b.doc_id").as("nid"))
      .distinct()
    val candCorpus = corpus.join(
      cands0.select(col("cid").as("doc_id")).distinct(), Seq("doc_id"),
      "left_semi")
    val sh = newSh.unionByName(shingles(candCorpus, n))
    val cands = cands0.select(least(col("cid"), col("nid")).as("i"),
      greatest(col("cid"), col("nid")).as("j")).distinct()
    jaccardOfShingles(sh, theta, candidates = Some(cands))
  }

  /** Streaming face of [[minHashIncremental]] — continuous drop-directory
    * ingest dedup: each micro-batch of newly arrived documents probes the
    * PERSISTED corpus signature store with exactly the batch operator
    * (same LSH probe, same exact verification — `foreachBatch` is the
    * contract that micro-batch ≡ batch), appending the verified
    * `(i, j, jaccard)` cross pairs to a parquet sink. This is the
    * production shape for corpus-scale streaming dedup: the corpus state
    * lives in the signature store table, NOT in Structured Streaming
    * state — a corpus never expires, so watermark-evicted join state
    * would either leak unboundedly or silently forget old documents;
    * the store is O(bands) small rows per corpus doc, loaded once.
    * Restart-safe via the checkpoint (a replayed batch re-appends its
    * pairs; dedupe downstream on (i, j) if exactly-once matters).
    * `newDocsStream` is any streaming DataFrame with (doc_id, text) —
    * e.g. [[graft.sources.Jsonl.readDocumentsStream]]; quarantine rows
    * (`_corrupt` non-null) are excluded from probing, never dropped from
    * the caller's stream. */
  def minHashIncrementalStream(newDocsStream: DataFrame, corpus: DataFrame,
                               corpusStore: DataFrame, sinkPath: String,
                               checkpointPath: String, n: Int = 3,
                               theta: Double = 0.7, bands: Int = 64,
                               rowsPerBand: Int = 2, seed: Long = 42L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn: (DataFrame, Long) => Unit = { (batch, _) =>
      val clean =
        if (batch.columns.contains("_corrupt"))
          batch.where(col("_corrupt").isNull).drop("_corrupt")
        else batch
      if (!clean.isEmpty)
        minHashIncremental(clean, corpus, Some(corpusStore), n, theta,
          bands, rowsPerBand, seed)
          .write.mode("append").parquet(sinkPath)
    }
    newDocsStream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch(fn)
      .start()
  }

  /** Duplicate-cluster assignment — the step a real dedup pipeline runs
    * AFTER any pair generator here (near-dup pairs are edges; keeping one
    * canonical doc per transitive group needs the connected component):
    * min-label propagation accelerated by pointer jumping — the relational
    * form of GraphX's Pregel connectedComponents plus the path-halving
    * step of classic PRAM CC (the same O(log D) trick as
    * large-star/small-star, Kiveris et al. 2014). Each round every node
    * takes the minimum label among itself and its neighbors, then chases
    * one hop of the label graph (l(v) <- min(l(v), l(l(v)))), so chain
    * depth halves per round; converged when no label changes, after
    * O(log diameter) rounds (a 50-round cap therefore guards only
    * adversarial inputs beyond ~2^50 deep). Per round: one edges ⋈ labels
    * join (the symmetric edge table is hash-partitioned once and reused
    * from cache), one min-aggregate, one left join back, one labels
    * self-join — all hash-shuffles on the id key, no driver state;
    * lineage is cut per round with `localCheckpoint` exactly like the
    * optimizer superstep loop, so plans stay O(1) across rounds. Fully
    * deterministic (min is order-independent).
    *
    * `nodes`: one id column (every doc — singletons cluster to
    * themselves). `pairs`: two id columns. Returns `(id, cluster)` with
    * cluster = min doc id of the component.
    */
  def duplicateClusters(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val idCol = nodes.columns.head
    val (pi, pj) = (pairs.columns(0), pairs.columns(1))
    // the pair generator may be a whole pipeline (MinHash LSH + exact
    // verify) whose LOGICAL PLAN alone is expensive: with a persist, every
    // downstream action still re-analyzes/canonicalizes the giant
    // expression tree for the cache lookup (measured ~3 s of driver time
    // per action at bands=64). localCheckpoint cuts the lineage to a
    // LogicalRDD, so the pipeline is evaluated once and every round plans
    // against a 2-column leaf.
    val p0 = pairs.select(col(pi).as("src"), col(pj).as("dst")).localCheckpoint()
    val sym = p0
      .union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val allNodes = nodes.select(col(idCol).as("id"))
    // a node with no edges can never change its label — keep the rounds'
    // working set to the nodes that actually appear in the pair graph
    // (near-dup corpora: a small fraction), and union the singletons back
    // unchanged at the end. One semi/anti join pair once, instead of
    // dragging every corpus row through every round's join + checkpoint.
    val connected = allNodes.join(sym.select(col("src").as("id")).distinct(),
      Seq("id"), "left_semi")
    var labels = connected.select(col("id"), col("id").as("cluster"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val msgs = sym.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min("cluster").as("nbr_min"))
      val prop0 = labels.join(msgs, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster")))
            .as("cluster"),
          col("cluster").as("old"))
      // pointer jumping (path halving): l(v) <- min(l(v), l(l(v))). Every
      // label is itself a node id in the same component, so chasing one hop
      // of the label graph halves chain depth each round — min-label
      // propagation alone needs diameter rounds (a 1000-deep near-dup
      // chain = 1000 shuffles), with the jump it converges in O(log D).
      // ADAPTIVE: real near-dup graphs are shallow stars that converge in
      // ≤2 propagation rounds, where the jump's extra self-join +
      // materialization is pure overhead (measured ~2× query cost at
      // sf0.1) — so the first two rounds run plain propagation and the
      // jump arms from round 3, preserving O(log D) for deep chains.
      // A left join: the labelled node is in the working set by
      // construction, but it may still carry a stale label this round.
      val stepBase =
        if (rounds < 2) prop0
        else {
          // materialized before the self-join: BOTH branches read it, and
          // an unmaterialized plan would run the propagation join+agg twice
          val prop = prop0.localCheckpoint()
          prop.as("a")
            .join(prop.select(col("id").as("lid"), col("cluster").as("lc"))
              .as("b"),
              col("a.cluster") === col("b.lid"), "left")
            .select(col("a.id").as("id"),
              least(col("a.cluster"), coalesce(col("b.lc"), col("a.cluster")))
                .as("cluster"),
              col("a.old").as("old"))
        }
      val step = stepBase
        .withColumn("chg", col("cluster") < col("old"))
        .drop("old")
        .localCheckpoint()
      changed = step.where(col("chg")).count()
      labels = step.select("id", "cluster")
      rounds += 1
    }
    sym.unpersist()
    // convergence is a CORRECTNESS property, not best-effort: exiting on
    // the round cap with changes still flowing would silently return split
    // components for any duplicate chain of diameter > cap
    require(changed == 0,
      s"duplicateClusters did not converge after $rounds rounds " +
        "(a duplicate chain longer than the round cap exists); " +
        "raise the cap or pre-collapse exact duplicates first")
    val singletons = allNodes.join(labels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("cluster"))
    labels.unionByName(singletons)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) over an embedding
    * corpus: k-means-cell candidate generation with exact cosine
    * verification ([[Ann.semanticNearDupPairs]]), connected components
    * over the verified pair graph ([[duplicateClusters]]), keep the
    * minimum-id document of each semantic cluster. The embedding-space
    * counterpart of [[minHashNearDups]]+clusters for text: one corpus
    * pass to train the quantizer, candidate volume ≈ probes·N²/nlist, CC
    * rounds bounded by cluster diameter. Returns (id, cluster, keep) for
    * EVERY corpus row — keep = 1 on cluster representatives (singletons
    * keep themselves). */
  def semanticDedup(corpus: org.apache.spark.sql.Dataset[graft.tsne.Point],
                    theta: Double, nlist: Int, probes: Int = 2,
                    iters: Int = 5, seed: Long = 42L): DataFrame = {
    val pairs = Ann.semanticNearDupPairs(corpus, theta, nlist, probes, iters, seed)
    duplicateClusters(corpus.toDF().select("id"), pairs.select("i", "j"))
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).cast("long").as("keep"))
  }

  // ---------------- SimHash --------------------------------------------

  /** 60-bit SimHash signatures over (occurrence-weighted) tokens, fully
    * relational: explode tokens → hash → explode bit positions → per-bit
    * majority vote → pack. Three hash aggregations, no UDF, and byte-for-
    * byte reproducible in SQL (the oracle recomputes it). */
  def simHashes(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), Hashing.hash60(col("tok")).as("h"))
    toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(Hashing.Bits - 1))).as("b"))
      .select(col("doc_id"), col("b"),
        when(expr("shiftright(h, cast(b as int)) & 1") === 1, 1)
          .otherwise(-1).as("v"))
      .groupBy("doc_id", "b").agg(sum("v").as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(cast(1 as bigint), cast(b as int))"))
        .otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash: banded exact-match blocking (split the
    * signature into `maxHamming + 1` chunks — any pair within the Hamming
    * radius must agree exactly on at least one chunk), then verify the true
    * Hamming distance. No all-pairs. */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = Hashing.Bits / chunks // 15-bit chunks for maxHamming=3
    val sigs = simHashes(docs)
    val chunkArr = array((0 until chunks).map(c =>
      shiftright(col("simhash"), c * width).bitwiseAND((1L << width) - 1)): _*)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(chunkArr).as(Seq("chunk", "ckey")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  // ---------------- shared verbatim spans ------------------------------

  /** Span-level exact-substring dedup — pairs of docs sharing a VERBATIM
    * character run of at least `minLen` chars, the boilerplate/mirror/
    * quotation signal that token-set similarity (Jaccard, MinHash) is
    * blind to: two docs sharing one long quoted paragraph inside
    * otherwise-unrelated text score near-zero Jaccard but must be flagged
    * by a span-level pass (the exact-substring stage of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — theirs
    * via a corpus suffix array; here as a two-phase anchor/verify
    * dataflow, the shape that distributes).
    *
    * Phase 1 — anchors (winnowing, Schleimer et al. 2003): hash every
    * `gramWidth`-char window, slide a window of `k = minLen - gramWidth
    *  + 1` consecutive hashes, keep each window's minimum. Any shared run
    * of `gramWidth + k - 1 = minLen` chars contains k consecutive shared
    * hash positions, i.e. one full hash window inside the run on BOTH
    * sides — same content, same minimum, selected by both: every
    * qualifying pair shares an anchor (lossless; hash collisions only ADD
    * candidates). The index carries ~2/(k+1) of positions, not all of
    * them — the 100 TB lever vs indexing every offset.
    *
    * `gramWidth` trades index density against candidate precision, and on
    * repetitive corpora precision wins decisively: 16-char grams recur
    * across hundreds of documents (and window-min selection is biased
    * toward globally small hash values, so exactly those recurring grams
    * become anchors), which at sf0.1 made ~every document a candidate;
    * 32-char anchors (k=9, ~20% index) cut the candidate pair set from
    * 250k to 322 against 259 true pairs. Widen the gram before shrinking
    * the window when candidates blow up.
    *
    * Phase 2 — exact relational verify, candidate DOCS only: semi-join
    * the corpus to the candidate id set, explode those docs' distinct
    * `minLen`-grams (actual strings, no hashes — collision-free), equi-
    * join and count per pair. Only documents that collided on an anchor
    * ever pay the full per-offset explosion.
    *
    * Returns `(i, j, n_shared)` — `n_shared` = number of distinct shared
    * `minLen`-grams (an alignment-free overlap measure; `>= 1` IS the
    * shared-span predicate, larger means a longer or repeated run). A
    * pair found by phase 2 shares a true span, so its membership in the
    * anchor candidate set is implied — no final re-filter is needed. */
  def sharedSpanPairs(docs: DataFrame, minLen: Int = 40,
                      gramWidth: Int = 32): DataFrame = {
    val cands = spanCandidatePairs(docs, minLen, gramWidth)
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    val candIds = cands.select(col("i").as("doc_id"))
      .unionByName(cands.select(col("j").as("doc_id")))
      .distinct()
    val cdocs = docs.join(candIds, Seq("doc_id"), "left_semi")
      .where(length(col("text")) >= minLen)
      .repartition(parallelism) // same explode-spread as the anchor side
    val gIdxs = sequence(lit(0), length(col("text")) - minLen)
    // per-doc array_distinct again — the exploded output is already
    // (doc, gram)-distinct, so no corpus-wide DISTINCT exchange
    val grams = cdocs.select(col("doc_id"),
      explode(array_distinct(
        transform(gIdxs, i => col("text").substr(i + 1, lit(minLen)))))
        .as("gram"))
    grams.as("a")
      .join(grams.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_shared"))
  }

  /** The winnowing anchor front end shared by [[sharedSpanPairs]] and
    * [[removeSharedSpans]]: candidate `(i, j)` doc pairs that collide on
    * a window-minimum fingerprint — a lossless superset of the pairs
    * sharing a verbatim ≥ `minLen` run (the winnowing guarantee; hash
    * collisions only ADD candidates). */
  private[pipeline] def spanCandidatePairs(docs: DataFrame, minLen: Int,
                                           gramWidth: Int): DataFrame = {
    require(gramWidth >= 1 && minLen > gramWidth,
      s"need minLen > gramWidth >= 1, got minLen=$minLen gramWidth=$gramWidth")
    val k = minLen - gramWidth + 1

    // spread the slim (id, text) projection over the full parallelism
    // BEFORE the per-offset md5 work — the CPU hot spot; a small-file scan
    // would otherwise run it on one core.
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    val txt = docs.select(col("doc_id"), col("text"))
      .where(col("text").isNotNull && length(col("text")) >= gramWidth)
      .repartition(parallelism)
    // the whole winnowing selection runs INSIDE one codegen'd projection,
    // array-at-a-time per document: hash every offset, slide the k-window
    // minimum, dedupe — then explode only the ~2/(k+1) selected anchors.
    // No exploded-offsets shuffle, no Window node, no per-group sort, and
    // the per-doc array_distinct replaces a corpus-wide DISTINCT exchange.
    val hArr = transform(sequence(lit(0), length(col("text")) - gramWidth),
      i => Hashing.hash60(col("text").substr(i + 1, lit(gramWidth))))
    val fpArr = {
      val h = col("__h")
      // guard: sequence(0, x) with x < 0 is DESCENDING (same trap as
      // shingles). Docs with < k hash windows are shorter than minLen and
      // can never carry a qualifying span — no anchors for them.
      array_distinct(transform(
        when(size(h) >= k, sequence(lit(0), size(h) - lit(k)))
          .otherwise(array().cast("array<int>")),
        p => array_min(slice(h, p + 1, lit(k)))))
    }
    // localCheckpoint: the anchor table sits under both sides of the
    // candidate self-join; cutting the lineage guarantees the hash
    // pipeline is evaluated once (exchange reuse is AQE-dependent), and
    // the checkpoint is 2 longs × ~2/(k+1) of the corpus offsets — small
    val anchors = txt.select(col("doc_id"), hArr.as("__h"))
      .select(col("doc_id"), explode(fpArr).as("fp"))
      .localCheckpoint()

    // localCheckpoint, not lineage: the candidate list feeds candIds twice
    // and sits under BOTH sides of the verify self-join — with a lazy plan
    // the whole hash→window→join anchor pipeline would be re-evaluated ~4×
    // (the same consumed-many-times seam as minHashNearDups' shingle table)
    anchors.as("a")
      .join(anchors.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
      .localCheckpoint()
  }

  /** Span-level duplicate REMOVAL — the production completion of
    * [[sharedSpanPairs]] (the removal step of Lee et al. 2022: cut the
    * duplicated bytes, keep one occurrence): every character of a
    * document covered by some `minLen`-gram that also occurs in a
    * LOWER-id document is removed — the lowest doc_id containing a gram
    * owns it and keeps its text — and the uncovered stretches are
    * concatenated in order. Returns `(doc_id, clean_text, n_removed)`
    * for EVERY input document (non-candidates pass through with
    * n_removed = 0).
    *
    * Scale shape: the winnowing anchor front end
    * ([[spanCandidatePairs]]) nominates candidate docs, so the exact
    * per-offset gram table is built for candidates only — everything
    * else passes through without ever being exploded. Ownership is a
    * per-gram `min(doc_id)` hash aggregate (shuffle ∝ candidate-doc
    * grams; no self-join, so a boilerplate gram shared by 10⁴ docs costs
    * 10⁴ rows, not 10⁸ pairs), and the cut itself is one codegen'd
    * `aggregate()` interval-merge over each doc's sorted covered
    * offsets — O(len + spans) per doc, no char-level fan-out. */
  def removeSharedSpans(docs: DataFrame, minLen: Int = 40,
                        gramWidth: Int = 32): DataFrame = {
    val parallelism = docs.sparkSession.sessionState.conf.numShufflePartitions
    val cands = spanCandidatePairs(docs, minLen, gramWidth)
    val candIds = cands.select(col("i").as("doc_id"))
      .unionByName(cands.select(col("j").as("doc_id")))
      .distinct()
    val cdocs = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text"))
      .where(col("text").isNotNull && length(col("text")) >= minLen)
      .repartition(parallelism) // spread the per-offset explode
    // every offset, positions kept (coverage needs them) — unlike the
    // distinct gram table of the pair counter
    val grams = cdocs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), length(col("text")) - minLen),
        i => col("text").substr(i + 1, lit(minLen)))).as(Seq("p", "gram")))
    val owner = grams.groupBy("gram").agg(min("doc_id").as("__mn"))
    val covered = grams.join(owner, "gram")
      .where(col("doc_id") > col("__mn"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("p"))).as("__ps"))
    docs.join(covered, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("__ps").isNull, col("text")).otherwise(expr(
          s"""aggregate(__ps,
             |  named_struct('e', 0, 'acc', ''),
             |  (st, p) -> named_struct(
             |    'e', greatest(st.e, p + $minLen),
             |    'acc', concat(st.acc,
             |      substr(text, st.e + 1, greatest(p - st.e, 0)))),
             |  st -> concat(st.acc, substr(text, st.e + 1)))""".stripMargin)))
      .select(col("doc_id"), col("clean_text"),
        (length(col("text")) - length(col("clean_text"))).cast("long")
          .as("n_removed"))
  }

  // ---------------- content-defined chunking ---------------------------

  /** Content-defined chunking (the rsync/LBFS shape — Muthitacharoen et
    * al., SOSP'01): cut each document where a rolling `window`-char hash
    * lands on a `maskBits`-bit zero — boundaries depend only on LOCAL
    * content, so an insertion early in a document shifts every byte but
    * re-aligns the cut points within one chunk, and identical passages
    * shared across documents produce identical chunks at any offset.
    * That alignment-invariance is what fixed-size blocking can never
    * give, and it makes `chunk_hash` the unit of cross-corpus storage
    * dedup ("how many of these 100 TB are literally the same bytes").
    *
    * Expected chunk length ≈ 2^maskBits chars (geometric); this is the
    * PURE form — no min/max chunk clamps, so every cut decision is a
    * function of its own window alone and the whole operator is one
    * map-side generator expression (positions → window hashes → cuts →
    * segment substrings), embarrassingly parallel with nothing sequential
    * per document. (Production CDC adds min/max clamps, which chain cut
    * decisions left-to-right; the unclamped form keeps the operator
    * deterministic-per-window and SQL-replayable.)
    *
    * Emits `(doc_id, chunk_idx, start, chunk_len, chunk_hash)` with
    * 1-based `start`, hash = [[Hashing.hash60]] of the chunk text.
    * Empty documents emit no chunks. */
  def contentDefinedChunks(docs: DataFrame, window: Int = 16,
                           maskBits: Int = 5): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maskBits >= 1 && maskBits <= 30,
      s"maskBits must be in [1, 30], got $maskBits")
    val mask = (1L << maskBits) - 1
    val w = window
    val spark = docs.sparkSession
    import spark.implicits._
    // one JVM pass per document: the cut rule costs one md5 per character
    // position, and [[Hashing.hash60]]'s numeric fast path (per-thread
    // digest, no hex strings) is what makes that affordable — the first
    // generator-expression spelling of the same rule spent ~10× the
    // digest cost on per-window substring/conv/format overhead (measured
    // 11.6 s → 1.3 s warm at sf0.1)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val len = if (text == null) 0 else text.length
          val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
          var p = 0 // 0-based window start; cut after char p+w-1, inside only
          while (p + w < len) {
            if ((Hashing.hash60(text.substring(p, p + w)) & mask) == 0L)
              cuts += p + w
            p += 1
          }
          if (len > 0) cuts += len
          Iterator.tabulate(cuts.length - 1) { i =>
            val s0 = cuts(i); val e0 = cuts(i + 1)
            (id, i.toLong, (s0 + 1).toLong, (e0 - s0).toLong,
              Hashing.hash60(text.substring(s0, e0)))
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "start", "chunk_len", "chunk_hash")
  }

  /** Leakage-safe train/val/test split: assign splits per NEAR-DUP CLUSTER,
    * not per document, so two near-copies can never land on opposite sides
    * of the train/eval boundary — the contamination channel a per-doc hash
    * split leaves wide open (a benchmark answer deduped imperfectly, a
    * boilerplate family straddling the fence — each is memorization leaking
    * into eval). Composition: [[duplicateClusters]] over any pair set →
    * every member keys [[graft.ops.Sampling.assignSplit]] by its cluster
    * label (the component's min id), inheriting all of assignSplit's
    * contracts — disjoint, exhaustive, append-stable — at cluster
    * granularity. Singletons cluster to themselves, so a pair-free corpus
    * degrades to exactly the per-doc split.
    *
    * Scale: the split itself is a pure map-side projection over the CC
    * output; cost is dominated by the pair generator + the O(log D) CC
    * rounds, both already bounded (see [[duplicateClusters]]). */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       fractions: Seq[(String, Double)],
                       salt: String = "split"): DataFrame = {
    val clusters = duplicateClusters(docs, pairs)
    graft.ops.Sampling.assignSplit(clusters, "cluster", fractions, salt)
      .select(col("id"), col("cluster"), col("split"))
  }

  /** Label backfill across near-dup clusters: documents whose metadata
    * label is missing (the `unlabeled` predicate) inherit the MAJORITY
    * label of the LABELED members of their duplicate cluster — the
    * production label-hygiene move for scraped corpora, where a re-crawl
    * or mirror often lost the tag its near-copy still carries. Ties break
    * to the lexicographically smallest label and an unlabeled document
    * with no labeled cluster peer (singletons included) reports the
    * sentinel `fallback` — both rules deterministic, so the output is a
    * pure function of (docs, pairs).
    *
    * Returns one row per document: `(doc_id, lang_out, backfilled)` where
    * `backfilled` is 1 exactly when a majority label was inherited.
    *
    * Scale: [[duplicateClusters]] bounds the graph work (O(log D)
    * rounds); the vote is one (cluster, label) hash aggregation over
    * LABELED MEMBERS OF NON-SINGLETON CLUSTERS ONLY — far smaller than
    * the corpus — ranked through the grouped-top-k operator (k=1, never a
    * full sort), then joined back id-keyed. No step touches text. */
  def labelBackfill(docs: DataFrame, pairs: DataFrame,
                    labelCol: String = "lang",
                    unlabeled: org.apache.spark.sql.Column,
                    fallback: String = "und"): DataFrame = {
    val clusters = duplicateClusters(docs.select("doc_id"), pairs)
    val labeled = clusters
      .join(docs.where(!unlabeled).select(col("doc_id"), col(labelCol)),
        col("id") === col("doc_id"))
      .groupBy("cluster", labelCol).agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy(col("votes").desc, col(labelCol))
    val majority = labeled
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("cluster"), col(labelCol).as("maj_label"))
    docs.select(col("doc_id"), col(labelCol), unlabeled.as("unl"))
      .join(clusters, col("doc_id") === col("id"), "left")
      .join(majority, Seq("cluster"), "left")
      .select(
        col("doc_id"),
        when(!col("unl"), col(labelCol))
          .otherwise(coalesce(col("maj_label"), lit(fallback)))
          .as("lang_out"),
        (col("unl") && col("maj_label").isNotNull).cast("long")
          .as("backfilled"))
  }

  /** Cross-source duplication matrix: for every unordered source pair,
    * the number of verified near-dup pairs straddling it (diagonal =
    * within-source duplication). THE overlap diagnostic before corpus
    * mixing — two crawls with a heavy off-diagonal cell are re-scrapes of
    * the same sites, and their mixing weights double-count unless one is
    * deduped against the other.
    *
    * Scale: two id-keyed equi-joins decorate the verified pair set (far
    * smaller than the corpus — LSH banding bounds it) with a slim
    * `(doc_id, source)` projection, then one hash aggregation over at
    * most |sources|² cells. Nothing is all-pairs in the corpus. */
  def sourceOverlapMatrix(docs: DataFrame, pairs: DataFrame,
                          sourceCol: String = "source"): DataFrame = {
    val src = docs.select(col("doc_id"), col(sourceCol))
    val decorated = pairs
      .join(src.select(col("doc_id").as("i"), col(sourceCol).as("src_i")), "i")
      .join(src.select(col("doc_id").as("j"), col(sourceCol).as("src_j")), "j")
    decorated
      .groupBy(
        least(col("src_i"), col("src_j")).as("src_a"),
        greatest(col("src_i"), col("src_j")).as("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** C4-style GLOBAL line-level dedup (Raffel et al. 2020 §2.2: "we
    * discarded all but one of any three-sentence span occurring more
    * than once", applied at line granularity like the public C4
    * scripts): every distinct line keeps exactly its FIRST occurrence —
    * smallest `(doc_id, line_index)` corpus-wide — and every later
    * occurrence in ANY document is removed; each doc's survivors are
    * re-joined in order. The cross-document rule is what kills sitewide
    * chrome and license blurbs that per-doc dedup can't see.
    *
    * Scale shape: one positional explode (rows ∝ total lines), the
    * first-occurrence winner as ONE map-side-combinable `min` of the
    * packed key `doc_id·2²⁰ + idx` (no window, no sort), one
    * hash-co-partitioned join back, and one per-doc rebuild
    * aggregation. Docs must have < 2²⁰ lines (a million-line "doc" is
    * a concatenation bug; guarded). Emits
    * `(doc_id, cleaned, n_kept, n_dropped)`; fully-deduped docs keep
    * their row with an empty `cleaned`. */
  def dedupLines(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val split_ = split(col(textCol), "\n", -1)
    val lines = docs
      .select(col(idCol), posexplode(split_).as(Seq("idx", "line")))
    val hashed = lines
      .withColumn("h", Hashing.hash60(col("line")))
      .withColumn("pk",
        when(col("idx") >= (1L << 20),
          raise_error(lit("dedupLines: doc has >= 2^20 lines")).cast("long"))
          .otherwise(col(idCol) * (1L << 20) + col("idx")))
    val first = hashed.groupBy("h").agg(min(col("pk")).as("fk"))
    val kept = hashed.join(first, "h").where(col("pk") === col("fk"))
    val rebuilt = kept.groupBy(idCol).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("idx"), col("line")))),
          s => s.getField("line")), "\n").as("cleaned"))
    val totals = lines.groupBy(idCol).agg(count(lit(1)).as("n_lines"))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .join(totals, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_lines"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"))
  }
}
