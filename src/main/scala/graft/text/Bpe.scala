package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: the real merge-table algorithm (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * the public recipe GPT-2's tokenizer follows), replacing the
  * pre-tokenizer piece COUNT upper bound (`token_counts_bpe`) with true
  * token counts under a learned merge table.
  *
  * Scale shape: training runs over the AGGREGATED (piece → frequency)
  * vocabulary — exactly how the published tables were built — so the
  * distributed part is one pre-tokenize + hash-agg pass, the driver loop
  * sees at most `vocabCap` rows (bounded by construction, the k-means
  * centroid-collect shape), and encoding ships the merge ranks to
  * executors as one broadcast-referenced constant applied by a native
  * expression inside whole-stage codegen.
  */
object Bpe {

  /** GPT-2-style pre-tokenizer, RE2-compatible subset (no lookahead) —
    * shared with TextOps' estimate query so exact and estimated counts
    * tokenize identically.
    */
  val PretokenPattern: String =
    """'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""

  /** Merge `pair`'s adjacent occurrences (left to right) in `syms`. */
  private def mergePair(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train a merge table over an aggregated (piece → freq) vocabulary:
    * repeatedly merge the most frequent adjacent symbol pair. Fully
    * deterministic: ties break on the lexicographically smallest pair.
    * Stops early when no pair repeats.
    */
  def train(pieceFreq: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      pieceFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case None => done = true
        case Some((pair, _)) =>
          merges += pair
          words = words.map { case (syms, f) => (mergePair(syms, pair), f) }
          m += 1
      }
    }
    merges.result()
  }

  /** Distributed vocabulary pass + driver-side training. `vocabCap`
    * bounds the collect (top pieces by frequency, deterministic
    * tiebreak); at 100 TB the vocabulary tail beyond the cap carries
    * negligible merge mass (Zipf), which is why the published tables
    * were trained the same way.
    */
  def trainFromCorpus(docs: DataFrame, textCol: String = "text",
                      nMerges: Int = 200, vocabCap: Int = 50000): Vector[(String, String)] = {
    val pieces = docs
      .select(explode(regexp_extract_all(col(textCol), lit(PretokenPattern), lit(0))).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("piece")).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(pieces, nMerges)
  }

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Encode one piece with the greedy lowest-rank merge loop (the GPT-2
    * `bpe()` algorithm): find the best-ranked adjacent pair, merge all
    * its occurrences, repeat until no pair has a rank.
    */
  def encode(piece: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (piece.length < 2) return if (piece.isEmpty) Array.empty else Array(piece)
    var syms = piece.map(_.toString).toArray
    var go = true
    while (go && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) go = false
      else syms = mergePair(syms, bestPair)
    }
    syms
  }

  /** Token count of one piece — the encode loop without materializing
    * the token strings, with a per-thread piece cache: pre-token pieces
    * are Zipf-distributed, so most rows hit the cache and never run the
    * merge loop (the same memoization tiktoken applies).
    */
  def countPiece(piece: String, ranks: Map[(String, String), Int]): Int = {
    val cache = pieceCache.get()
    if (cache.ranks ne ranks) { cache.ranks = ranks; cache.map.clear() }
    val cached = cache.map.get(piece)
    if (cached != null) cached.intValue()
    else {
      val n = encode(piece, ranks).length
      if (cache.map.size < (1 << 16)) cache.map.put(piece, Integer.valueOf(n))
      n
    }
  }

  private final class PieceCache {
    var ranks: Map[(String, String), Int] = _
    val map = new java.util.HashMap[String, Integer]()
  }
  private val pieceCache = new ThreadLocal[PieceCache] {
    override def initialValue(): PieceCache = new PieceCache
  }

  /** Kernel: total BPE token count of an array of pre-token pieces. */
  def countTokens(arr: ArrayData, ranks: Map[(String, String), Int]): Long = {
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      total += countPiece(arr.getUTF8String(i).toString, ranks)
      i += 1
    }
    total
  }

  def bpeCountTokens(pieces: Column, ranks: Map[(String, String), Int]): Column =
    Bridge.column(BpeCountTokens(Bridge.expression(pieces), ranks))
}

/** Total BPE token count of an array<string> of pre-token pieces under a
  * constant merge-rank table. The ranks ship once per task via the
  * expression's reference object (not per row), and doGenCode keeps the
  * scan stage inside whole-stage codegen — same design as
  * [[graft.functions.DotProductConst]].
  */
case class BpeCountTokens(child: Expression, ranks: Map[(String, String), Int])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_tokens expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    Bpe.countTokens(v.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ranks", ranks, "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.text.Bpe.countTokens($a, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_count_tokens"
}
