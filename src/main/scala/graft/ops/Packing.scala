package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.pipeline.Hashing

/** Sequence packing: lay the corpus out as one deterministic token stream
  * and cut it every `seqLen` tokens — the concat-and-chop packing used to
  * build fixed-length training rows, where a document may span a sequence
  * boundary. The layout is decided per row identity (salted hash order,
  * like [[Sharding]]), so the packing is reproducible on any engine and
  * re-salting reshuffles between epochs.
  *
  * Each document needs its global token START offset — an exact prefix sum
  * over the total order. Spelled as `SUM(...) OVER (ORDER BY ...)` with no
  * partition clause that is a single-task funnel; here it is the classic
  * two-phase distributed scan: range-partition by the sort key, sum tokens
  * per partition, prefix those P sums on the driver (P longs — bounded),
  * then stream each partition once adding its offset. Two jobs, no
  * shuffle beyond the range exchange, partition-count invariant.
  */
object Packing {

  /** Adds `(start_offset, seq_first, seq_last, pos_in_seq)` to `df`:
    * the document's tokens occupy stream positions
    * `[start_offset, start_offset + tokens)`, i.e. sequences
    * `seq_first .. seq_last` of length `seqLen`, entering sequence
    * `seq_first` at `pos_in_seq`. `tokenCol` must be a non-negative
    * numeric column; zero-token documents occupy no stream positions and
    * are dropped (they exist in no training row). `keyCol` must be unique
    * (total-order tiebreaker). */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    seqLen: Long, salt: String = "pack",
                    partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    Seq("start_offset", "seq_first", "seq_last", "pos_in_seq", "__h", "__t",
      "__start").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column (reserved by packSequences)"))
    val spark = df.sparkSession
    val h = Hashing.hash60(
      concat(coalesce(col(keyCol).cast("string"), lit("null")),
        lit("#" + salt)))
    val filtered = df
      .where(col(tokenCol) > 0L)
      .withColumn("__h", h)
    // no explicit partition count unless the caller pins one: an
    // unnumbered range exchange lets AQE size partitions by bytes, and the
    // two-phase scan is partition-count invariant (any count yields the
    // same offsets; range placement preserves the global order)
    val ranged =
      if (partitions > 0) filtered.repartitionByRange(partitions, col("__h"), col(keyCol))
      else filtered.repartitionByRange(col("__h"), col(keyCol))
    val sorted = ranged
      .sortWithinPartitions(col("__h"), col(keyCol))
      .withColumn("__t", col(tokenCol).cast("long"))
      // eager materialization: phases 1 and 2 both read this, and local
      // checkpoint blocks are freed by the ContextCleaner once the
      // returned frame is dropped — no caller clearCache() contract
      // (a plain persist() here leaked one cached relation per call)
      .localCheckpoint()
    val tokIdx = sorted.schema.fieldIndex("__t")
    // phase 1: per-partition token sums — P longs to the driver, nothing else
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        var s = 0L
        rows.foreach(r => s += r.getLong(tokIdx))
        Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    // phase 2: one streaming pass per partition with its start offset
    val schema = sorted.schema.add("__start", LongType, nullable = false)
    val withStart = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
        var running = offsets(pid)
        rows.map { r =>
          val start = running
          running += r.getLong(tokIdx)
          Row.fromSeq(r.toSeq :+ start)
        }
      }, schema)
    val out = withStart.select(
      df.columns.map(col) ++ Seq(
        col("__start").as("start_offset"),
        (col("__start") / seqLen).cast("long").as("seq_first"),
        ((col("__start") + col("__t") - 1L) / seqLen).cast("long")
          .as("seq_last"),
        (col("__start") % seqLen).as("pos_in_seq")): _*)
    out
  }

  /** Boundary-preserving packing — next-fit bins that NEVER split a
    * document across training rows, the "packing without
    * cross-contamination" alternative to [[packSequences]]'s
    * concat-and-chop (a document straddling a sequence boundary leaks
    * its neighbors into the attention window; this variant trades a
    * little padding for clean rows). Documents first lay out in the
    * deterministic salted-hash order as `shardSize`-document shards
    * ([[Sharding.assignShards]] — the epoch-shuffle machinery, reused);
    * WITHIN each shard a next-fit fold opens a new bin whenever the
    * running token count would exceed `capacity`. Oversized documents
    * (> capacity tokens) get a bin alone — emitted, never silently
    * dropped, so the caller can route them to truncation explicitly.
    *
    * Scale shape: the fold is per shard over ≤ `shardSize` documents via
    * the shuffle's own spillable sorted groups — bins are a SEQUENTIAL
    * recurrence, and bounding it to a shard is what makes it distributed
    * without a single-task stream (the same move as the capped-session
    * fold). All integer arithmetic; the layout is a pure function of
    * (key set, token counts, salt, capacity, shardSize). Keys must be
    * unique and castable to long. Emits
    * `(id, tokens, shard, pos, bin, bin_start)` — `bin` counts within
    * the shard, `bin_start` is the document's token offset in its bin. */
  def packBinsNoSplit(df: DataFrame, keyCol: String, tokenCol: String,
                      capacity: Long, shardSize: Long,
                      salt: String = "packns"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val sharded = Sharding.assignShards(
      df.select(col(keyCol), col(tokenCol).cast("long").as("__tok")),
      keyCol, shardSize, salt)
    sharded.select(col(keyCol).cast("long").as("k"), col("__tok"),
        col("shard"), col("pos"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapSortedGroups(col("pos")) { (shard, rows) =>
        var bin = -1L
        var running = 0L
        rows.map { case (k, t, _, pos) =>
          if (bin < 0L || running + t > capacity) { bin += 1; running = 0L }
          val start = running
          running += t
          (k, t, shard, pos, bin, start)
        }
      }
      .toDF("id", "tokens", "shard", "pos", "bin", "bin_start")
  }
}
