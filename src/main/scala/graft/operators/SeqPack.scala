package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Sequence packing — the last step of a pretraining-data pipeline before
  * tensorization: concatenate tokenized documents into fixed-length
  * training sequences (maxLen tokens) so padding waste is bounded, and
  * account for the packing efficiency.
  *
  * Scale shape: one range exchange (so packing order is deterministic:
  * doc_id order within range partitions), then packing is a streaming
  * per-partition fold — O(1) state per task, no driver involvement, and
  * sequence ids are made globally unique by offsetting with the partition
  * id. Greedy next-fit (close the sequence when the next doc overflows)
  * guarantees any two consecutive sequences sum past maxLen, so fill is
  * > 50% for every sequence except possibly the last one per partition.
  * Overlong documents are head-truncated to maxLen, the standard recipe.
  */
object SeqPack {

  final case class PackedDoc(seq_id: Long, doc_id: Long, n_tok: Long, offset: Long)

  /** (seq_id, doc_id, n_tok, offset): which sequence each document landed
    * in and where. `parts` sets packing parallelism (each partition packs
    * independently; more partitions only add ≤ parts partially-filled
    * final sequences) — it defaults to the session's shuffle parallelism
    * so a 1000-executor cluster packs on every core, and is only worth
    * pinning in tests that assert exact sequence layout.
    */
  def packDocs(docs: DataFrame, maxLen: Int, parts: Int = 0): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    val nParts =
      if (parts > 0) parts
      else docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    docs
      .select(col("doc_id"), least(size(tokens(col("text"))), lit(maxLen)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .repartitionByRange(nParts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var seqLocal = 0L
        var fill = 0L
        it.map { case (docId, nTok) =>
          if (fill + nTok > maxLen) { seqLocal += 1; fill = 0L }
          val row = PackedDoc((pid << 32) | seqLocal, docId, nTok, fill)
          fill += nTok
          row
        }
      }
  }

  /** Registered query: pack at 512 tokens, report global packing stats.
    * Rows-only (the per-partition fold is not SQL-expressible); the
    * invariants — token conservation, fill ≤ maxLen, the next-fit > 50%
    * fill guarantee, determinism — are SeqPackSpec's goldens.
    */
  val packSequences: QueryDef = QueryDef(
    "curation_pack_sequences",
    (s, dir) => {
      val packed = packDocs(Tables(s, dir, "documents"), maxLen = 512)
      val perSeq = packed.groupBy(col("seq_id"))
        .agg(sum(col("n_tok")).as("fill"), count(lit(1)).as("n_docs"))
      perSeq.agg(
        count(lit(1)).as("n_sequences"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("fill")).as("total_tokens"),
        round(avg(col("fill")) / 512.0, 4).as("avg_fill_frac"),
        max(col("fill")).as("max_fill"))
    })

  val all: Seq[QueryDef] = Seq(packSequences)
}
