package graft.operators

import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact top-k frequent tokens via a two-pass sketch-then-verify plan —
  * the scale-safe alternative to shuffling the full token stream
  * (p6_word_count's one-shuffle exact plan is fine until the token
  * stream dwarfs the network; this plan's first shuffle is bounded by
  * `width × partitions` rows no matter the corpus size).
  *
  * Pass 1: per-partition Misra-Gries summaries (width W counters). For
  * each surviving token, the summed estimate m(t) satisfies
  * m(t) ≤ true(t) ≤ m(t) + n/W (each partition under-counts by at most
  * n_p/W, errors add across partitions). Any token in the true top-k
  * therefore has upper bound m(t) + n/W ≥ τ, where τ is the k-th
  * largest lower bound — so the candidate set {t : m(t) + n/W ≥ τ} is
  * a PROVABLE superset of the true top-k, with no distributional
  * assumption.
  *
  * Pass 2: exact recount restricted to candidates (keyed equi-join on
  * the token — AQE broadcasts the candidate side when it is small,
  * which on Zipfian text it always is), exact top-k of the candidates
  * = exact global top-k.
  *
  * The only driver-side data is τ (k numbers) and nothing else;
  * candidate selection and recount stay in the plan. mapPartitions is
  * justified here: a per-partition decremented counter table is
  * genuinely imperative state no Catalyst aggregate expresses.
  */
object HeavyHitters {

  /** Sentinel key carrying each partition's token count through the
    * same shuffle as the sketch rows (a NUL byte cannot appear in
    * [a-z0-9]+ tokens).
    */
  private[operators] val TotalKey = "\u0000total"

  /** Misra-Gries over one partition: at most `width` counters; on
    * overflow every counter decrements (amortized O(1) via batch
    * cleanup). Emits (token, count) survivors + the sentinel total.
    */
  private[operators] def mgPartition(toks: Iterator[String], width: Int)
      : Iterator[(String, Long)] = {
    val counts = new java.util.HashMap[String, Long](width * 2)
    var n = 0L
    toks.foreach { t =>
      n += 1
      val c = counts.getOrDefault(t, 0L)
      if (c > 0L || counts.size < width) counts.put(t, c + 1L)
      else {
        // decrement-all: drop zeros in one sweep
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    val out = Vector.newBuilder[(String, Long)]
    counts.forEach((k, v) => out += ((k, v)))
    out += ((TotalKey, n))
    out.result().iterator
  }

  /** Exact top-k (tf desc, token asc) of `docs`.textCol tokens.
    *
    * The sketch narrows candidates only when it can PROVE the top-k is
    * inside it: tokens absent from every partition's summary have
    * true(t) ≤ n/W, so if τ ≤ n/W a true-top-k token could have been
    * dropped entirely and the plan falls back to the plain one-shuffle
    * exact aggregate (the p6 shape) — exactness is unconditional, the
    * sketch is purely a shuffle-volume optimization that switches
    * itself off when the distribution is too flat for its width.
    */
  def topK(docs: DataFrame, k: Int = 20, width: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks: Dataset[String] =
      docs.select(explode(tokens(col("text"))).as("t")).as[String]

    // pass 1: sketch shuffle is <= width rows per partition + sentinel
    val sketch = toks.mapPartitions(mgPartition(_, width)).toDF("t", "c")
      .groupBy(col("t")).agg(sum(col("c")).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // coalesce-agg, not head(): an empty corpus has no sentinel row
    val n = sketch.filter(col("t") === TotalKey)
      .agg(coalesce(sum(col("m")), lit(0L))).as[Long].head()
    val slack = n / width + 1 // ceil-safe over-estimate of the total MG error
    // τ = k-th largest lower bound among surviving tokens (k numbers —
    // the one bounded driver round-trip)
    val lows = sketch.filter(col("t") =!= TotalKey)
      .orderBy(col("m").desc, col("t")).limit(k).select(col("m")).as[Long].collect()
    val tau = if (lows.length < k) 0L else lows.last

    val exact = docs.select(explode(tokens(col("text"))).as("word"))
    val counted =
      if (tau <= slack) {
        // flat tail: the sketch cannot certify a superset — full exact agg
        exact
      } else {
        // pass 2: exact recount of the certified candidate superset only
        val candidates = sketch.filter(col("t") =!= TotalKey)
          .filter(col("m") + lit(slack) >= lit(tau))
          .select(col("t").as("word"))
        exact.join(candidates, Seq("word"), "left_semi")
      }
    val out = counted.groupBy(col("word")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("word")).limit(k)
    sketch.unpersist(blocking = false)
    out
  }

  /** Registered query: exact top-20 tokens — same ordering contract as
    * p6_word_count, so the oracle is the plain exact SQL the sketch
    * plan must reproduce bit for bit (k=20 keeps τ above the error
    * slack on the test corpus, exercising the sketch path rather than
    * the fallback).
    */
  val heavyHitters: QueryDef = QueryDef(
    "heavy_hitters_topk",
    (s, dir) => topK(Tables(s, dir, "documents")),
    Some("""SELECT word, COUNT(*) AS tf FROM (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents)
      GROUP BY word ORDER BY tf DESC, word LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(heavyHitters)
}
