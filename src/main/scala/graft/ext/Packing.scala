package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Greedy sequence packing — the step between chunking ([[TextAnalysis
 * .chunkDocs]]) and the trainer: concatenate documents into fixed-size
 * context windows ("bins") so almost no tokens are wasted as padding.
 * The contract is the standard contiguous first-fit rule: walk the
 * shard in id order and open a new bin whenever the next document
 * would overflow `capacity`.
 *
 * Packing is inherently sequential, so the unit of sequential work must
 * be bounded: rows are split into `shardCol` groups (a hash of the id,
 * a date bucket — anything with enough cardinality for the cluster) and
 * each shard packs independently. Execution shape:
 *
 *   repartition(shard) → sortWithinPartitions(shard, id) → mapPartitions
 *
 * One shuffle; the sort is Spark's external sort (spills, never OOMs);
 * the per-row state is two integers, so a partition streams through in
 * O(1) memory no matter how large the shard. Because every shard lands
 * wholly inside one partition and bins reset on shard change, the
 * assignment is deterministic and layout-independent — the property a
 * resumable training run needs.
 *
 * A document larger than `capacity` gets a bin of its own (real
 * pipelines chunk first, so this is the rare tail); it never causes
 * its neighbours to be mis-binned.
 */
object Packing {

  /** One packed row: `bin_id` is dense per shard starting at 0;
   *  `bin_offset` is the token count already in the bin before this
   *  row (i.e. the row's start position in the concatenated window). */
  case class Packed(shard: Long, id: Long, n_tokens: Int, bin_id: Int, bin_offset: Int)

  /** One materialized context window: the documents of a bin joined in
   *  id order with single spaces. */
  case class PackedSeq(shard: Long, bin_id: Int, n_docs: Int, bin_tokens: Int, seq_text: String)

  /**
   * Assign every row to a context-window bin. `shardCol`/`idCol` must
   * be integral (cast to long); `tokenCol` is the row's token count.
   * Output columns: shard, id, n_tokens, bin_id, bin_offset.
   */
  def packGreedy(
      df: DataFrame,
      shardCol: Column,
      idCol: Column,
      tokenCol: Column,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity $capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(shardCol.cast("long").as("_1"), idCol.cast("long").as("_2"),
        tokenCol.cast("int").as("_3"))
      .as[(Long, Long, Int)]
      .repartition($"_1")
      .sortWithinPartitions($"_1", $"_2")
      .mapPartitions { rows =>
        // Streaming state per partition: the current shard, the open
        // bin's index and fill. Shards never span partitions, so a
        // shard change is a full reset.
        var shard = 0L
        var first = true
        var bin = 0
        var fill = 0
        rows.map { case (s, id, toks) =>
          if (first || s != shard) { shard = s; first = false; bin = 0; fill = 0 }
          if (fill > 0 && fill + toks > capacity) { bin += 1; fill = 0 }
          val offset = fill
          fill += toks
          Packed(s, id, toks, bin, offset)
        }
      }
      .toDF()
  }

  /**
   * Materialize the packed context windows themselves: the same greedy
   * assignment as [[packGreedy]], but each bin's documents are joined
   * (id order, single spaces) INSIDE the streaming pass — one row per
   * window, ready for a trainer. Still exactly one shuffle; the open
   * bin's buffer is the only state, so memory is O(capacity · token
   * length), never O(partition).
   */
  def packSequences(
      df: DataFrame,
      shardCol: Column,
      idCol: Column,
      tokenCol: Column,
      textCol: Column,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity $capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(shardCol.cast("long").as("_1"), idCol.cast("long").as("_2"),
        tokenCol.cast("int").as("_3"), textCol.cast("string").as("_4"))
      .as[(Long, Long, Int, String)]
      .repartition($"_1")
      .sortWithinPartitions($"_1", $"_2")
      .mapPartitions { rows =>
        var shard = 0L
        var first = true
        var bin = 0
        var fill = 0
        var nDocs = 0
        val buf = new StringBuilder
        def emit(): PackedSeq = {
          val r = PackedSeq(shard, bin, nDocs, fill, buf.result())
          buf.clear(); nDocs = 0
          r
        }
        val out = Iterator.unfold(()) { _ =>
          var emitted: Option[PackedSeq] = None
          var more = rows.hasNext
          while (emitted.isEmpty && more) {
            val (s, _, toks, text) = rows.next()
            if (first) { shard = s; first = false }
            else if (s != shard) { // shard boundary: flush, full reset
              emitted = Some(emit()); shard = s; bin = 0; fill = 0
            } else if (fill > 0 && fill + toks > capacity) { // bin overflow
              emitted = Some(emit()); bin += 1; fill = 0
            }
            if (nDocs > 0) buf.append(' ')
            buf.append(text)
            nDocs += 1
            fill += toks
            more = rows.hasNext
          }
          emitted match {
            case Some(r) => Some((r, ()))
            case None if nDocs > 0 => Some((emit(), ())) // tail bin
            case None => None
          }
        }
        out
      }
      .toDF()
  }
}
