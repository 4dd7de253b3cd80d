package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Sequence packing — the last step of a pretraining-data pipeline before
  * tensorization: concatenate tokenized documents into fixed-length
  * training sequences (maxLen tokens) so padding waste is bounded, and
  * account for the packing efficiency.
  *
  * Scale shape: documents are assigned to buckets by ARITHMETIC on the
  * doc id (`doc_id >> bucketShift` — an arithmetic shift, i.e. floor
  * division, total over the full signed id domain), then one hash
  * exchange on the bucket and a streaming per-partition fold that packs
  * each bucket independently in doc_id order — O(1) state per task, no
  * driver involvement. Unlike the previous repartitionByRange layout,
  * whose sampled boundaries moved with input splits and parallelism, the
  * bucket layout is a PURE FUNCTION OF THE DATA: the same corpus packs
  * identically on 4 cores or 1000 executors (and the layout is therefore
  * mirrorable by a sequential engine — see the oracle below). Bucket
  * count grows with the corpus, so parallelism scales with data size.
  * Greedy next-fit (close the sequence when the next doc overflows)
  * guarantees any two consecutive sequences in a bucket sum past maxLen,
  * so fill is > 50% for every sequence except possibly the last one per
  * bucket. Overlong documents are head-truncated to maxLen, the
  * standard recipe.
  */
object SeqPack {

  final case class PackedDoc(bucket: Long, seq_in_bucket: Long,
                             doc_id: Long, n_tok: Long, offset: Long)

  /** (bucket, seq_in_bucket, doc_id, n_tok, offset): which sequence each
    * document landed in and where. A sequence is globally identified by
    * the (bucket, seq_in_bucket) pair — two bounded longs, no bit-packing
    * that could collide or overflow on hashed (full-range) doc ids.
    * `bucketShift` sets docs-per-bucket = 2^shift for dense ids.
    */
  def packDocs(docs: DataFrame, maxLen: Int, bucketShift: Int = 6): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), least(size(tokens(col("text"))), lit(maxLen)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("bucket", shiftright(col("doc_id"), bucketShift))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .select(col("bucket"), col("doc_id"), col("n_tok"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var cur = 0L
        var started = false
        var seqLocal = 0L
        var fill = 0L
        it.map { case (bucket, docId, nTok) =>
          if (!started || bucket != cur) {
            cur = bucket; started = true; seqLocal = 0L; fill = 0L
          }
          if (fill + nTok > maxLen) { seqLocal += 1; fill = 0L }
          val row = PackedDoc(bucket, seqLocal, docId, nTok, fill)
          fill += nTok
          row
        }
      }
  }

  /** Registered query: pack at 512 tokens, report global packing stats.
    * The per-partition fold is mirrorable in ANSI SQL because the layout
    * is deterministic: the oracle reproduces the per-bucket next-fit
    * recurrence with a recursive CTE (buckets advance in lockstep, one
    * doc per step), aggregates per sequence, and emits the same summary.
    * avg_fill_frac is fixed to 4dp via integer arithmetic
    * (floor(1e4·total/(n·512))/1e4), bit-exact across engines.
    */
  val packSequences: QueryDef = QueryDef(
    "curation_pack_sequences",
    (s, dir) => {
      val packed = packDocs(Tables(s, dir, "documents"), maxLen = 512)
      val perSeq = packed.groupBy(col("bucket"), col("seq_in_bucket"))
        .agg(sum(col("n_tok")).as("fill"), count(lit(1)).as("n_docs"))
      perSeq.agg(
        count(lit(1)).as("n_sequences"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("fill")).as("total_tokens"),
        max(col("fill")).as("max_fill"))
        .withColumn("avg_fill_frac",
          expr("CAST(total_tokens * 10000 DIV (n_sequences * 512) AS DOUBLE) / 10000.0"))
        .select(col("n_sequences"), col("n_docs"), col("total_tokens"),
          col("avg_fill_frac"), col("max_fill"))
    },
    Some("""WITH RECURSIVE
      d AS (SELECT doc_id, doc_id // 64 AS bucket,
              LEAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 512) AS n_tok
            FROM documents
            WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0),
      r AS (SELECT bucket, doc_id, n_tok,
              row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
            FROM d),
      pack(bucket, rn, n_tok, seq, fill_after) AS (
        SELECT bucket, rn, n_tok, 0 AS seq, n_tok AS fill_after
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.bucket, r.rn, r.n_tok,
          CASE WHEN p.fill_after + r.n_tok > 512 THEN p.seq + 1 ELSE p.seq END,
          CASE WHEN p.fill_after + r.n_tok > 512 THEN r.n_tok
               ELSE p.fill_after + r.n_tok END
        FROM pack p JOIN r ON r.bucket = p.bucket AND r.rn = p.rn + 1
      ),
      perseq AS (SELECT bucket, seq, SUM(n_tok) AS fill, COUNT(*) AS n_docs
                 FROM pack GROUP BY bucket, seq)
      SELECT COUNT(*) AS n_sequences,
        CAST(SUM(n_docs) AS BIGINT) AS n_docs,
        CAST(SUM(fill) AS BIGINT) AS total_tokens,
        CAST((CAST(SUM(fill) AS BIGINT) * 10000) // (COUNT(*) * 512) AS DOUBLE) / 10000.0
          AS avg_fill_frac,
        CAST(MAX(fill) AS BIGINT) AS max_fill
      FROM perseq"""))

  val all: Seq[QueryDef] = Seq(packSequences)
}
