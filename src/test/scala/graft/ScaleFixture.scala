package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native sf1-equivalent scale evidence (VERDICT r4 next-round #5): a
  * seeded generator for a ~6M-row lineitem + 1.5M orders + 100k-doc corpus
  * whose CARDINALITIES actually grow (distinct orderkeys, custkeys, vocab
  * mixes, duplicate groups) — unlike [[ScaleEvidence]]'s key-shifted
  * replication, which checks linearity but reuses the same 600k-row value
  * distributions. Generation is deterministic per (partition, row): every
  * run produces byte-identical tables.
  *
  * Writes parquet to `target/sf1eq/` once (regenerate by deleting the dir),
  * then runs the same six shapes ScaleEvidence measures, at sf0.1 (x1
  * baseline) and on the generated tables (x10 rows, x10 cardinality), and
  * prints rows + seconds — record in SCALE.md.
  * `sbt 'Test/runMain graft.ScaleFixture'` */
object ScaleFixture {

  private val Vocab: Array[String] = {
    // 5,000 distinct tokens (sf0.1's corpus draws from ~40): zipf-ish usage
    // emerges from the rank-skewed draw below
    (0 until 5000).map(i => s"tok$i").toArray
  }

  def generate(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    val nOrders = 1500000L
    val nCust = 150000L
    val nDocs = 100000L

    // lineitem: ~4 lines per order → ~6M rows
    spark.range(0, nOrders, 1, 32).flatMap { ok =>
      val rng = new java.util.Random(0xACE1L ^ (ok * 0x9E3779B97F4A7C15L))
      val lines = 1 + rng.nextInt(7) // 1..7, mean 4
      (0 until lines).map { l =>
        val qty = 1 + rng.nextInt(50)
        val price = math.rint((901.0 + rng.nextInt(104999)) * qty / 100.0 * 100) / 100
        val flag = rng.nextInt(4) match {
          case 0 => "A"; case 1 => "R"; case _ => "N"
        }
        val status = if (flag == "N") "O" else "F"
        // l_quantity is DOUBLE and l_linenumber INT to match the driver
        // testdata schema exactly — a long quantity column made the r6
        // sf1eq oracle pass hash-mismatch on repr (long 38213305 vs
        // decimal 38213305.0) in every lineitem SUM query
        (ok + 1, 1L + rng.nextInt(200000), 1L + rng.nextInt(10000),
          l + 1, qty.toDouble, price, flag, status)
      }
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    // orders: skewed customer popularity (hash-squared draw → hot customers)
    spark.range(0, nOrders, 1, 32).map { ok =>
      val rng = new java.util.Random(0xBEEFL ^ (ok * 0x9E3779B97F4A7C15L))
      val r = rng.nextDouble()
      val cust = 1L + (r * r * (nCust - 1)).toLong // quadratic skew
      val price = math.rint((1000.0 + rng.nextDouble() * 499000.0) * 100) / 100
      val status = if (rng.nextBoolean()) "O" else "F"
      (ok + 1, cust, status, price,
        new java.sql.Timestamp(694224000000L + (rng.nextInt(2557).toLong * 86400000L)),
        s"${1 + rng.nextInt(5)}-PRIORITY")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    // documents: 5k-token vocab, rank-skewed draw, ~2% exact duplicate pairs
    // (doc 50k+i copies doc i's text) so dedup collapses real groups
    val vocabBc = spark.sparkContext.broadcast(Vocab)
    def textOf(id: Long): String = {
      val rng = new java.util.Random(0xD0C5L ^ (id * 0x9E3779B97F4A7C15L))
      val v = vocabBc.value
      val len = 40 + rng.nextInt(260)
      val sb = new StringBuilder
      var t = 0
      while (t < len) {
        val r = rng.nextDouble()
        sb.append(v(((r * r) * v.length).toInt min (v.length - 1)))
        if (t < len - 1) sb.append(' ')
        t += 1
      }
      sb.toString
    }
    spark.range(0, nDocs, 1, 32).map { id =>
      val src = id % 2000 // source of a duplicate's text
      val text = if (id >= 98000) textOf(src) else textOf(id)
      val rng = new java.util.Random(0x1A6L ^ (id * 0x9E3779B97F4A7C15L))
      val lang = rng.nextInt(10) match {
        case 0 | 1 => "de"; case 2 => "zh"; case _ => "en"
      }
      (id, text, lang, s"src${id % 64}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // customer + nation: the join-family dimension tables, schema-matched
    // to testdata, so q_semi_anti / q_outer_join / q_join_agg /
    // q_bucketed_join / q_salted_join run in the sf1eq oracle pass.
    // ~10% of custkeys referenced by orders have NO customer row (orders
    // draw 1..150k; customers cover 1..135k) so outer/anti joins have
    // real unmatched rows at scale, mirroring the driver fixture's shape.
    val segs = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    spark.range(1, nCust * 9 / 10 + 1, 1, 32).map { ck =>
      val rng = new java.util.Random(0xC057L ^ (ck * 0x9E3779B97F4A7C15L))
      (ck, f"Customer#$ck%09d", rng.nextInt(25).toLong,
        math.rint((rng.nextDouble() * 11000.0 - 1000.0) * 100) / 100,
        segs(rng.nextInt(segs.length)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    spark.range(0, 25, 1, 1).map { nk =>
      (nk, s"NATION_$nk", nk % 5)
    }.toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    writeSupplier(spark, dir)
    writeEmbeddings(spark, dir)

    // events: 1M rows / 15k users over one month (10× sf0.1 in rows AND
    // user cardinality), mirroring the driver fixture's shape — event_id
    // walks forward in time with jitter, 5 event types, 2-decimal values,
    // {"k": int} props. ts is java.time.LocalDateTime so the parquet
    // encoding is timestamp[us] isAdjustedToUTC=false (TIMESTAMP_NTZ) —
    // the SAME naive flavor the driver fixture ships, so the sf1eq pass
    // exercises Events.normalizeTs exactly as the driver does.
    val nEvents = 1000000L
    val eventTypes = Array("view", "click", "error", "purchase", "signup")
    val stepUs = 30L * 86400L * 1000000L / nEvents
    spark.range(0, nEvents, 1, 32).map { id =>
      val rng = new java.util.Random(0xE7E27L ^ (id * 0x9E3779B97F4A7C15L))
      val us = id * stepUs + (rng.nextDouble() * 4e6).toLong
      val ts = java.time.LocalDateTime.ofEpochSecond(
        1704067200L + us / 1000000L, ((us % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      (id, ts, rng.nextInt(15000).toLong, eventTypes(rng.nextInt(5)),
        math.rint(rng.nextDouble() * 2000) / 100.0,
        s"""{"k": ${rng.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** Embeddings: 100k unit-normalized 64-dim float vectors (10× sf0.1's
    * 2k rows), matching the driver fixture's shape exactly — isotropic
    * gaussian directions (the driver's label column carries no cluster
    * structure: measured same-label mean cosine 8e-4), labels near-uniform
    * 0..9 — so the exact-ranking embedding queries (k-means assignment,
    * brute cosine top-k, hard negatives) run in the sf1eq oracle pass at
    * native scale. */
  def writeEmbeddings(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    spark.range(0, 100000L, 1, 32).map { id =>
      val rng = new java.util.Random(0xE3BEDL ^ (id * 0x9E3779B97F4A7C15L))
      val g = Array.fill(64)(rng.nextGaussian())
      val nrm = math.sqrt(g.map(x => x * x).sum)
      (id, g.map(x => (x / nrm).toFloat), rng.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** Supplier: the co-supply graph's node domain (q_triangles /
    * q_clustering_coeff) — keys cover lineitem's full l_suppkey range. */
  def writeSupplier(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    spark.range(1, 10001, 1, 4).map { sk =>
      val rng = new java.util.Random(0x50BBL ^ (sk * 0x9E3779B97F4A7C15L))
      (sk, f"Supplier#$sk%09d", rng.nextInt(25),
        math.rint((rng.nextDouble() * 11000.0 - 1000.0) * 100) / 100)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
  }

  def main(args: Array[String]): Unit = {
    val gen = "target/sf1eq"
    val spark = SparkSession.builder().appName("scale-fixture")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (!new java.io.File(s"$gen/documents.parquet").exists()) {
        val t0 = System.nanoTime()
        generate(spark, gen)
        println(f"SF1EQ generated in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } else {
        if (!new java.io.File(s"$gen/supplier.parquet").exists()) {
          // backfill for fixtures generated before the supplier table existed
          writeSupplier(spark, gen)
          println("SF1EQ supplier table backfilled")
        }
        if (!new java.io.File(s"$gen/embeddings.parquet").exists()) {
          writeEmbeddings(spark, gen)
          println("SF1EQ embeddings table backfilled")
        }
      }
      if (args.contains("fixture-only")) { spark.stop(); return }
      def time(f: => Long): (Long, Double) = {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
        }
        (runs.head._1, runs.map(_._2).min)
      }
      for ((label, dir) <- Seq(("sf0.1", "/root/testdata/sf0.1"), ("sf1eq", gen))) {
        val li = spark.read.parquet(s"$dir/lineitem.parquet").cache()
        val ord = spark.read.parquet(s"$dir/orders.parquet").cache()
        val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
        li.count(); ord.count(); docs.count()

        val (aggN, aggT) = time(li.groupBy("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1))).count())
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val (topkN, topkT) = time(ord.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3).count())
        val (joinN, joinT) = time(ord.join(li,
          col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey").agg(sum("l_extendedprice")).count())
        val (dedupN, dedupT) = time(pipeline.Dedup.exactCanonical(docs).count())
        val (repN, repT) = time(pipeline.TextOps.repetitionSignals(docs).count())
        val bench = spark.read.parquet(s"$dir/documents.parquet")
          .where(col("doc_id") % 37 === 0)
        val (decN, decT) = time(pipeline.TextOps.decontaminate(docs, bench).count())
        val (distN, distT) = time(
          li.select(countDistinct(col("l_orderkey"))).as[Long](
            org.apache.spark.sql.Encoders.scalaLong).head())
        // duplicate clustering over the exact-dup edge set (sf1eq plants a
        // 2% duplicate layer; sf0.1 has a handful) — the CC rounds at 20×
        // nodes and 250× edges
        val (ccN, ccT) = time {
          val canon = pipeline.Dedup.exactCanonical(docs)
          val edges = canon.where(col("doc_id") =!= col("canon_id"))
            .select(col("doc_id").as("i"), col("canon_id").as("j"))
          pipeline.Dedup.duplicateClusters(docs.select("doc_id"), edges).count()
        }

        // training-output trio on the doc corpus: epoch-shard assignment
        // (terasort rank) and sequence packing (two-phase prefix sum) —
        // both all-shuffle-bound, the shapes that would regress if a
        // single-partition funnel crept in
        val tokd = docs.select(col("doc_id"),
          size(pipeline.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        val (shardN, shardT) = time(
          ops.Sharding.assignShards(docs.select("doc_id"), "doc_id",
            shardSize = 4096L, salt = "e0").count())
        val (packN, packT) = time(
          ops.Packing.packSequences(tokd, "doc_id", "n_tokens",
            seqLen = 2048L, salt = "p0").count())
        // LM quality scorers: vocabulary/bigram aggs + frequency joins —
        // token-volume-bound, the 20×-docs growth shape to watch
        val (uniN, uniT) = time(pipeline.TextOps.unigramLogProb(docs).count())
        val (biN, biT) = time(pipeline.TextOps.bigramLogProb(docs).count())
        // token-budget sampling under a REAL mix skew: sources collapsed so
        // one stratum holds ~80% of the corpus, budgets sized to keep most
        // of it (worst-case scan). The two-phase per-stratum prefix must
        // scale with partitions, not stratum size — before round 6 this was
        // a single task sorting the dominant stratum.
        val skewed = tokd.withColumn("source",
          when(col("doc_id") % 64 < 52, lit("web")).otherwise(lit("rest")))
        val (budN, budT) = time(ops.Sampling.tokenBudgetSample(skewed,
          "doc_id", "source", col("n_tokens"),
          Map("web" -> (1L << 40), "rest" -> (1L << 40)), salt = "b0").count())

        println(f"SF1EQ $label%-6s lineitem=${li.count()} docs=${docs.count()} " +
          f"agg=$aggT%.2f($aggN) topk=$topkT%.2f($topkN) joinagg=$joinT%.2f($joinN) " +
          f"dedup=$dedupT%.2f($dedupN) repetition=$repT%.2f($repN) " +
          f"decontam=$decT%.2f($decN) distinct_ok=$distT%.2f($distN) " +
          f"clusters=$ccT%.2f($ccN) shard=$shardT%.2f($shardN) pack=$packT%.2f($packN) " +
          f"unigram=$uniT%.2f($uniN) bigram=$biT%.2f($biN) budget_skew=$budT%.2f($budN)")
        li.unpersist(); ord.unpersist(); docs.unpersist()
      }
    } finally spark.stop()
  }
}
