package graft.operators

import graft.util.Checkpoints.ReliableOps
import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.ShingleHashes
import graft.util.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** URL/domain-level curation operators — the standard pretraining-filter
  * family (C4 / RefinedWeb recipe): domain blocklist filtering, per-domain
  * quota sampling, and paragraph-level exact-chunk dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * exact-substring complement to MinHash).
  *
  * The synthetic `documents` table has no URL column, so a deterministic
  * host is derived from `source` (srcN → srcN.example.com) and reversed to
  * SURT form with built-in column functions — the same normalization the
  * host-graph jobs apply via [[graft.ops.SurtHost]] (host reversal,
  * hostlinks_to_graph.py:65-76), kept as pure Catalyst expressions here so
  * the whole filter stays inside whole-stage codegen and is mirrorable in
  * the DuckDB oracle.
  */
object Curation {

  /** Blocked SURT domains — stands in for a UT1/C4-style blocklist table.
    * In production this is a table of millions of rows; the join below is
    * written as a broadcast anti-join because even a multi-million-entry
    * blocklist is a few hundred MB — always the small side against a
    * 100 TB corpus.
    */
  private val BlockedSurts = Seq(
    "com.example.src3", "com.example.src7", "com.example.src12", "com.example.src18")

  /** source → SURT host (com.example.srcN) as codegen'd built-ins. */
  private def withSurtHost(df: DataFrame): DataFrame =
    df.withColumn("surt_host",
      concat_ws(".", reverse(split(concat(col("source"), lit(".example.com")), "\\."))))

  private def surtCte: String =
    """SELECT *, array_to_string(list_reverse(string_split(source || '.example.com', '.')), '.') AS surt_host
       FROM documents"""

  /** Domain blocklist filter: anti-join docs' SURT hosts against the
    * blocklist, then per-domain accounting of what survives. The
    * blocklist side broadcasts (never a shuffle of the corpus); the
    * per-domain agg is one hash aggregate with map-side partials.
    */
  val domainBlocklist: QueryDef = QueryDef(
    "curation_domain_blocklist",
    (s, dir) => {
      import s.implicits._
      val docs = withSurtHost(Tables(s, dir, "documents"))
      val block = BlockedSurts.toDF("surt_host")
      docs.join(broadcast(block), Seq("surt_host"), "left_anti")
        .groupBy(col("surt_host"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    },
    Some(s"""WITH d AS ($surtCte)
      SELECT surt_host, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM d
      WHERE surt_host NOT IN ('com.example.src3','com.example.src7','com.example.src12','com.example.src18')
      GROUP BY surt_host"""))

  /** Per-domain quota sampling: keep a deterministic top-N per domain
    * (largest docs first, doc_id tiebreak) — the RefinedWeb-style cap on
    * any one domain's contribution. row_number-over-partition with a
    * rank filter is the scale-correct shape: Spark's WindowGroupLimit
    * rule pushes the `rk <= N` limit below the sort, so each task keeps
    * a bounded N-row heap per domain instead of fully sorting the
    * biggest domain's partition — the skew case (one domain = half the
    * corpus) stays O(N) memory per task.
    */
  val domainQuota: QueryDef = QueryDef(
    "curation_domain_quota",
    (s, dir) => ScaleUtils.groupedTopK(
        withSurtHost(Tables(s, dir, "documents")),
        Seq(col("surt_host")), Seq(col("n_chars").desc, col("doc_id")), k = 5)
      .select(col("surt_host"), col("doc_id"), col("n_chars"), col("rk")),
    Some(s"""WITH d AS ($surtCte),
      r AS (SELECT surt_host, doc_id, n_chars,
        CAST(row_number() OVER (PARTITION BY surt_host ORDER BY n_chars DESC, doc_id) AS INT) AS rk
        FROM d)
      SELECT surt_host, doc_id, n_chars, rk FROM r WHERE rk <= 5"""))

  /** Paragraph-level exact-chunk dedup (Lee et al. 2021 §3.1's
    * exact-substring idea, in the fixed-stride form public pipelines use):
    * tokenize, cut non-overlapping 20-token chunks, hash each chunk, and
    * call a chunk duplicated when its hash appears in ≥2 distinct docs.
    * Output = per-source duplicated-chunk mass.
    *
    * Scale shape: one narrow scan → explode (≈ n_tokens/20 rows per doc,
    * SMALLER than the token explode p6 already does) → hash agg on the
    * 128-bit chunk digest (key cardinality ≈ distinct chunks, uniform by
    * construction — md5 keys cannot skew) → the ≥2-doc hash set joins
    * back onto the chunk stream. Verified plan at sf0.1: the dup set
    * broadcasts (duplicated-chunk hashes ≪ chunks), so the accounting
    * side never shuffles before its final source agg; if the dup set
    * outgrows the broadcast threshold at 100 TB, AQE falls back to a
    * hash join keyed on the same digest. Nothing touches the driver.
    */
  /** Tokenize + non-overlapping `stride`-token windows:
    * (doc_id, source, chunk). Shared by dedup_paragraph and the Bloom
    * incremental dedup ([[graft.dedup.BloomDedup]]) so both operate on
    * the identical chunk definition.
    */
  private[graft] def tokenChunks(df: DataFrame, stride: Int = 20): DataFrame =
    df.select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("toks"),
        explode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(stride))).as("s"))
      .select(col("doc_id"), col("source"),
        concat_ws(" ", slice(col("toks"), col("s") + 1, lit(stride))).as("chunk"))

  val dedupParagraph: QueryDef = QueryDef(
    "dedup_paragraph",
    (s, dir) => {
      val chunks = tokenChunks(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("source"),
          md5(col("chunk").cast("binary")).as("h"), length(col("chunk")).as("chunk_chars"))
      val dup = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select(col("h"), lit(1).as("is_dup"))
      chunks.join(dup, Seq("h"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("is_dup") === 1, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(when(col("is_dup") === 1, col("chunk_chars").cast("long")).otherwise(0L)).as("dup_chars"))
    },
    Some("""WITH d AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      c AS (SELECT doc_id, source,
              md5(array_to_string(toks[s+1:s+20], ' ')) AS h,
              length(array_to_string(toks[s+1:s+20], ' ')) AS chunk_chars
            FROM d, unnest(generate_series(0, greatest(len(toks)-1, 0), 20)) AS t(s)),
      dup AS (SELECT h FROM c GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT source, COUNT(*) AS n_chunks,
        CAST(SUM(CASE WHEN c.h IN (SELECT h FROM dup) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        CAST(SUM(CASE WHEN c.h IN (SELECT h FROM dup) THEN chunk_chars ELSE 0 END) AS BIGINT) AS dup_chars
      FROM c GROUP BY source"""))

  /** Deterministic stratified sampling: per-language keep rates applied
    * via an arithmetic hash of doc_id (Knuth multiplicative, reduced mod
    * a prime with overflow-safe modular arithmetic so Spark and DuckDB
    * compute bit-identical keys — Spark's murmur `hash()` and DuckDB's
    * `hash()` differ, so neither is oracle-mirrorable). This is the
    * C4-style language/source rebalancing step: embarrassingly parallel,
    * no shuffle before the accounting agg, reproducible across runs and
    * engines — a re-run of the pipeline keeps exactly the same documents.
    */
  val stratifiedSample: QueryDef = QueryDef(
    "curation_stratified_sample",
    (s, dir) => {
      val key = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L % 1000003L),
        lit(1000003L)) % 1000
      val rate = when(col("lang") === "en", 800)
        .when(col("lang") === "zh", 300)
        .otherwise(500)
      Tables(s, dir, "documents")
        .filter(key < rate)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    },
    Some("""SELECT source, lang, COUNT(*) AS n_kept,
        CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM documents
      WHERE ((doc_id % 1000003) * (2654435761 % 1000003)) % 1000003 % 1000
            < CASE WHEN lang = 'en' THEN 800 WHEN lang = 'zh' THEN 300 ELSE 500 END
      GROUP BY source, lang"""))

  /** Deterministic global shuffle into training shards — the data-order
    * randomization step before writing a corpus for training. Each doc
    * gets an arithmetic hash key (same overflow-safe construction as
    * [[stratifiedSample]], bit-identical across Spark, DuckDB, and
    * re-runs), shard = key mod N, within-shard order = (key, doc_id).
    * One shuffle keyed on shard, no global sort: a random *permutation*
    * needs total order, but training shards only need each shard to be
    * an unbiased sample read in a well-mixed order — the standard
    * at-scale relaxation. The query grades both halves: per-shard
    * accounting checks assignment, min_by/max_by over the composite
    * order key check the ordering's endpoints.
    */
  private def shuffleKey: org.apache.spark.sql.Column =
    pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L % 1000003L),
      lit(1000003L))

  val shardShuffle: QueryDef = QueryDef(
    "curation_shard_shuffle",
    (s, dir) => {
      // composite order key: hash-mixed, doc_id-tiebroken so min_by/max_by
      // are unique even on key collisions (doc_id < 1e6 at these SFs; the
      // general form is a struct/order-by, see writeShuffledShards)
      val ord = shuffleKey * lit(1000000L) + col("doc_id")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (shuffleKey % 8).as("shard"), ord.as("ord"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
          min_by(col("doc_id"), col("ord")).as("first_doc"),
          max_by(col("doc_id"), col("ord")).as("last_doc"))
    },
    Some("""WITH d AS (SELECT doc_id, n_chars,
        ((doc_id % 1000003) * (2654435761 % 1000003)) % 1000003 AS k
      FROM documents)
      SELECT k % 8 AS shard, COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        MIN_BY(doc_id, k * 1000000 + doc_id) AS first_doc,
        MAX_BY(doc_id, k * 1000000 + doc_id) AS last_doc
      FROM d GROUP BY k % 8"""))

  /** Write the shuffled corpus: `outDir/shard=N/` files, rows within each
    * shard sorted by the mix key. One exchange (keyed on shard), one
    * sorted file per shard task; re-runs are byte-stable because key,
    * assignment, and order are all deterministic functions of doc_id.
    */
  def writeShuffledShards(docs: DataFrame, outDir: String, nShards: Int): Unit =
    docs.withColumn("shard", (shuffleKey % nShards).cast("int"))
      .withColumn("ord", shuffleKey)
      // sort prefix MUST be the partition column: FileFormatWriter demands
      // rows grouped by partition value and would otherwise inject its own
      // (unstable) sort by shard, destroying the mix order
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Source mixing to a token budget — the Pile/LLaMA recipe: each
    * source gets an equal share of a global char budget (here 50% of the
    * corpus), expressed as a per-source rate = share/available. Rates
    * below 1 downsample deterministically; rates above 1 UPSAMPLE by
    * repeating the source for floor(rate) full epochs plus a
    * deterministically-sampled partial epoch — the epoch repeat is an
    * `explode(sequence)` so upsampling is a row-generator in the plan,
    * not a self-union per epoch. All sampling decisions are integer
    * comparisons on the arithmetic doc hash (permille precision), so
    * Spark, DuckDB, and re-runs agree bit-for-bit.
    *
    * Scale shape: one narrow agg builds the 1-row global and per-source
    * rate tables; both broadcast back onto the corpus (equi-joins on a
    * constant and on source — never a corpus shuffle); the explode and
    * final accounting agg are map-side. Skew-safe: rates are per-source
    * scalars, the biggest source streams through its tasks.
    */
  val mixSources: QueryDef = QueryDef(
    "curation_mix",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val avail = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("avail_chars"))
      val glob = avail.agg(sum(col("avail_chars")).as("total_chars"),
        count(lit(1)).as("n_sources")).withColumn("one", lit(1))
      val rates = avail.withColumn("one", lit(1))
        .join(broadcast(glob), "one")
        .withColumn("permille",
          floor(lit(1000.0) * (lit(0.5) * col("total_chars") / col("n_sources")) /
            col("avail_chars")).cast("long"))
        .select(col("source"), col("permille"))
      val mixKey = pmod(pmod(col("doc_id"), lit(1000033L)) * lit(2654435761L % 1000033L),
        lit(1000033L)) % 1000
      docs.join(broadcast(rates), "source")
        .withColumn("copies",
          (col("permille") / 1000).cast("long") +
            when(mixKey < col("permille") % 1000, 1L).otherwise(0L))
        .filter(col("copies") >= 1)
        .select(col("source"), col("n_chars"),
          explode(sequence(lit(1L), col("copies"))).as("epoch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_copies"), sum(col("n_chars")).as("chars_out"),
          max(col("epoch")).as("max_epoch"))
    },
    Some("""WITH avail AS (SELECT source, SUM(n_chars) AS avail_chars FROM documents GROUP BY source),
      overall AS (SELECT SUM(avail_chars) AS total_chars, COUNT(*) AS n_sources FROM avail),
      rates AS (SELECT source,
          CAST(floor(1000.0 * (0.5 * total_chars / n_sources) / avail_chars) AS BIGINT) AS permille
        FROM avail, overall),
      mixed AS (SELECT d.source, d.n_chars, e.epoch
        FROM (SELECT doc_id, source, n_chars,
                permille // 1000 +
                  (CASE WHEN ((doc_id % 1000033) * (2654435761 % 1000033)) % 1000033 % 1000
                        < permille % 1000 THEN 1 ELSE 0 END) AS copies
              FROM documents JOIN rates USING (source)) d,
             unnest(generate_series(1, d.copies)) AS e(epoch)
        WHERE d.copies >= 1)
      SELECT source, COUNT(*) AS n_copies, CAST(SUM(n_chars) AS BIGINT) AS chars_out,
        CAST(MAX(epoch) AS BIGINT) AS max_epoch
      FROM mixed GROUP BY source"""))

  /** Content-defined chunking dedup — the variable-boundary complement
    * to [[dedupParagraph]]'s fixed stride (the LBFS/FastCDC idea at token
    * granularity): a chunk boundary falls after any token whose content
    * hash starts with hex '0' (p = 1/16 → ~16-token average chunks), so
    * an insertion re-chunks only the chunk containing it, where a fixed
    * stride shifts every later window and misses all downstream dups.
    * Boundaries derive from md5 — identical in Spark and DuckDB — which
    * makes this fully oracle-checkable end to end, unlike rolling-hash
    * variants keyed on engine-specific hashes.
    *
    * Scale shape: posexplode (the p6 token stream plus a position), a
    * per-doc running-sum window (partitioned by doc_id — task memory
    * bounded by the longest document, never global), chunk reassembly as
    * one hash agg, then the dedupParagraph accounting on the 128-bit
    * chunk digest (uniform keys, cannot skew).
    */
  val cdcChunks: QueryDef = QueryDef(
    "dedup_cdc_chunks",
    (s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "source", "pos", "w")
        .withColumn("b",
          when(substring(md5(col("w").cast("binary")), 1, 1) === "0", 1).otherwise(0))
      val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // boundary token CLOSES its chunk: cid = boundaries strictly before
      val withCid = tok.withColumn("cid", sum(col("b")).over(win) - col("b"))
      // consumed twice (the dup-digest aggregate and the accounting
      // join); the eager stable checkpoint materializes the per-chunk
      // digest table once — un-checkpointed, both consumers re-ran the
      // tokenize → posexplode → running-sum window → md5 pipeline (the
      // digest rows are ~1/16th of the token stream, the cheap side of
      // that trade at any scale)
      val chunks = withCid.groupBy(col("doc_id"), col("source"), col("cid"))
        .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w"))).as("chunk"))
        .select(col("doc_id"), col("source"),
          md5(col("chunk").cast("binary")).as("h"),
          length(col("chunk")).as("chunk_chars"))
        .stableCheckpoint()
      val dup = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"), lit(1).as("is_dup"))
      chunks.join(dup, Seq("h"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("is_dup") === 1, 1L).otherwise(0L)).as("n_dup_chunks"),
          sum(when(col("is_dup") === 1, col("chunk_chars").cast("long")).otherwise(0L))
            .as("dup_chars"))
    },
    Some("""WITH d AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      t AS (SELECT doc_id, source, toks[i] AS w, i AS pos,
              CASE WHEN substring(md5(toks[i]), 1, 1) = '0' THEN 1 ELSE 0 END AS b
            FROM d, unnest(generate_series(1, len(toks))) AS g(i)),
      c AS (SELECT doc_id, source, pos, w,
              SUM(b) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) - b AS cid
            FROM t),
      ch AS (SELECT doc_id, source, cid,
              md5(string_agg(w, ' ' ORDER BY pos)) AS h,
              length(string_agg(w, ' ' ORDER BY pos)) AS chunk_chars
            FROM c GROUP BY doc_id, source, cid),
      dup AS (SELECT h FROM ch GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
      SELECT source, COUNT(*) AS n_chunks,
        CAST(SUM(CASE WHEN ch.h IN (SELECT h FROM dup) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        CAST(SUM(CASE WHEN ch.h IN (SELECT h FROM dup) THEN chunk_chars ELSE 0 END) AS BIGINT) AS dup_chars
      FROM ch GROUP BY source"""))

  /** Word-blocklist filter — the C4 "bad words" recipe (Raffel et al.
    * 2020 drop any page containing a blocklisted word): membership test
    * over the token array, per-source accounting of dropped docs and
    * surviving char mass. `arrays_overlap` against a literal array is a
    * codegen'd scan-stage predicate — no join, no shuffle until the small
    * agg — so at 100 TB the filter rides the same scan as tokenization.
    * (A multi-million-word list would instead broadcast-join a terms
    * table, the [[domainBlocklist]] shape; inlining is right for the
    * C4-sized list of hundreds.) The synthetic vocabulary is near-uniform,
    * so 'dup' (~5% of docs) is the live trigger and the other entries
    * exercise the no-match path; BadwordsSpec plants richer cases.
    */
  val badwords: QueryDef = QueryDef(
    "curation_badwords",
    (s, dir) => {
      val blocked = Seq("dup", "spam", "casino")
      val docs = Tables(s, dir, "documents")
        .withColumn("flagged",
          arrays_overlap(tokens(col("text")), lit(blocked.toArray)))
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("flagged"), 1).otherwise(0)).as("n_dropped"),
          sum(when(!col("flagged"), col("n_chars")).otherwise(0)).as("kept_chars"))
    },
    Some("""WITH d AS (SELECT source, n_chars,
        list_has_any(regexp_extract_all(lower(text), '[a-z0-9]+'),
                     ['dup','spam','casino']) AS flagged
      FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        CAST(SUM(CASE WHEN NOT flagged THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM d GROUP BY source"""))

  /** Crawl snapshot diff — the operational query a recurring-crawl
    * pipeline runs between snapshots: per-source counts of added /
    * removed / changed / unchanged documents, keyed by doc id with a
    * content-hash compare for change detection. One full-outer join
    * shuffle-keyed on doc_id (uniform, unskewable) plus a small agg —
    * at 100 TB this is two scans and one join, no corpus re-read per
    * status. The two snapshots are simulated from the documents table
    * (A drops doc_id%7=0 → "added" in B; B drops doc_id%11=0 →
    * "removed"; B revises text for doc_id%5=0 → "changed").
    */
  /** Per-doc diff status between two snapshots keyed by (doc_id, source):
    * added / removed / changed / unchanged, change detected by content
    * hash. Shared by the registered query (simulated snapshots) and the
    * `crawl_diff` CLI job (two real documents dirs).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("ha"))
    val bb = b.select(col("doc_id"), col("source"),
      md5(col("text").cast("binary")).as("hb"))
    aa.join(bb, Seq("doc_id", "source"), "full_outer")
      .withColumn("status",
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("source"), col("status"))
  }

  val crawlDiff: QueryDef = QueryDef(
    "crawl_diff",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 7 =!= 0)
      val b = docs.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      snapshotDiff(a, b)
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""WITH a AS (SELECT doc_id, source, md5(text) AS ha
        FROM documents WHERE doc_id % 7 != 0),
      b AS (SELECT doc_id, source,
          md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END) AS hb
        FROM documents WHERE doc_id % 11 != 0)
      SELECT COALESCE(a.source, b.source) AS source,
        CASE WHEN ha IS NULL THEN 'added'
             WHEN hb IS NULL THEN 'removed'
             WHEN ha != hb THEN 'changed' ELSE 'unchanged' END AS status,
        COUNT(*) AS n
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id AND a.source = b.source
      GROUP BY 1, 2"""))

  /** Temperature-scaled language sampling (the mT5 / XLM-R multilingual
    * recipe, Xue et al. 2021): sampling weight q_l ∝ p_l^α with α = 0.3
    * upweights low-resource languages relative to their natural share
    * p_l. Reports, per language, the natural share, the temperature-
    * scaled share, and the doc allocation at a 10k-doc budget.
    *
    * Scale shape: two 1-row/`|langs|`-row aggregates broadcast back —
    * the corpus is touched exactly once by the first count; everything
    * downstream is arithmetic over a handful of rows. Engine-stable
    * math: p and the pow() weight are rounded to 6dp before use, the
    * weight total is an order-independent decimal sum, and the budget
    * allocation rounds a 4dp share times a round number (never a
    * floor() of a float boundary).
    */
  val temperatureMix: QueryDef = QueryDef(
    "curation_temperature_mix",
    (s, dir) => {
      // |langs| rows, consumed by the total aggregate AND the weight
      // table — un-checkpointed, the corpus count-by-lang ran per
      // consumer
      val byLang = Tables(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .stableCheckpoint()
      val tot = byLang.agg(sum(col("n_docs")).as("total")).withColumn("one", lit(1))
      val w = byLang.withColumn("one", lit(1)).join(broadcast(tot), "one")
        .withColumn("p6", round(col("n_docs").cast("double") / col("total"), 6))
        .withColumn("w6", round(
          pow(col("n_docs").cast("double") / col("total"), 0.3), 6))
      val sw = w.agg(sum(col("w6").cast(
          org.apache.spark.sql.types.DecimalType(38, 12))).cast("double").as("sw"))
        .withColumn("one", lit(1))
      w.join(broadcast(sw), "one")
        .withColumn("q4", round(col("w6") / col("sw"), 4))
        .select(col("lang"), col("n_docs"), col("p6"), col("q4"),
          round(col("q4") * 10000, 0).cast("long").as("docs_at_10k"))
    },
    Some("""WITH bl AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
      t AS (SELECT SUM(n_docs) AS total FROM bl),
      w AS (SELECT lang, n_docs,
          round(CAST(n_docs AS DOUBLE) / total, 6) AS p6,
          round(pow(CAST(n_docs AS DOUBLE) / total, 0.3), 6) AS w6
        FROM bl, t),
      sw AS (SELECT CAST(SUM(CAST(w6 AS DECIMAL(38,12))) AS DOUBLE) AS sw FROM w)
      SELECT lang, n_docs, p6, round(w6 / sw, 4) AS q4,
        CAST(round(round(w6 / sw, 4) * 10000, 0) AS BIGINT) AS docs_at_10k
      FROM w, sw"""))

  /** Keep-earliest merge of two crawl snapshots (the companion write
    * path to `crawl_diff`'s read path): union both crawls, group by
    * content hash, keep exactly one copy per distinct content — the
    * earliest crawl, ties broken by doc_id — and account per source how
    * many survived from each crawl and how many duplicates were dropped.
    * This is the recurring-crawl ingestion step: crawl N+1 lands next to
    * crawls 1..N and only novel content enters the corpus.
    *
    * Scale shape: ONE hash aggregation on the content digest picks each
    * group's winner (no window — a boilerplate text duplicated across
    * millions of pages streams through its aggregation task instead of
    * serializing through one task's sort), then a keyed join back tags
    * every row kept/dropped. The winner is the lexicographic MIN of the
    * (crawl, doc_id) STRUCT — total over the full signed 64-bit doc_id
    * domain, where the earlier arithmetic packing crawl*1e12 + doc_id
    * silently inverted earliest-wins for negative or >=1e12 ids (e.g.
    * the xxhash64(url) ids warc_to_documents assigns).
    */
  def crawlMerge(a: DataFrame, b: DataFrame): DataFrame = {
    // slim digest rows (~80 B/row, no text), consumed by BOTH the
    // winner aggregate and the join probe — un-checkpointed, the
    // union+md5 pass over both crawls ran twice
    val m = a.withColumn("crawl", lit(1L))
      .unionByName(b.withColumn("crawl", lit(2L)))
      .select(col("doc_id"), col("source"), col("crawl"),
        md5(col("text").cast("binary")).as("h"),
        struct(col("crawl"), col("doc_id")).as("key"))
      .stableCheckpoint()
    val winners = m.groupBy(col("h")).agg(min(col("key")).as("win_key"))
    m.join(winners, "h")
      .withColumn("kept", col("key") === col("win_key"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("kept") && col("crawl") === 1, 1L).otherwise(0L)).as("n_kept_a"),
        sum(when(col("kept") && col("crawl") === 2, 1L).otherwise(0L)).as("n_kept_b"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dups_dropped"))
  }

  /** Registered instance over the same synthesized crawl pair as
    * `crawl_diff` (A drops every 7th doc, B drops every 11th and
    * revises every 5th), so the two queries describe one scenario from
    * the read and write sides.
    */
  val crawlMergeQuery: QueryDef = QueryDef(
    "crawl_merge",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val a = docs.filter(col("doc_id") % 7 =!= 0)
      val b = docs.filter(col("doc_id") % 11 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")))
      crawlMerge(a, b)
    },
    Some("""WITH m AS (
        SELECT doc_id, source, 1 AS crawl, md5(text) AS h,
               {'crawl': 1, 'doc_id': doc_id} AS key
        FROM documents WHERE doc_id % 7 != 0
        UNION ALL
        SELECT doc_id, source, 2 AS crawl,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END) AS h,
               {'crawl': 2, 'doc_id': doc_id} AS key
        FROM documents WHERE doc_id % 11 != 0),
      w AS (SELECT h, MIN(key) AS win_key FROM m GROUP BY h)
      SELECT source,
        CAST(SUM(CASE WHEN key = win_key AND crawl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_a,
        CAST(SUM(CASE WHEN key = win_key AND crawl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_b,
        CAST(SUM(CASE WHEN key != win_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dups_dropped
      FROM m JOIN w USING (h)
      GROUP BY source"""))

  /** Cross-source duplication matrix: for every source pair, the number
    * of DISTINCT word-w-gram shingles they share plus the shingle-set
    * Jaccard — the standard diagnostic for "how much of source B is
    * already in source A" before fixing mixture weights (exact-dup
    * overlap is a special case; shingle overlap also surfaces templated
    * boilerplate and partial copies).
    *
    * Scale shape: ONE corpus scan and ONE corpus-wide shuffle — each
    * shingle's source set is gathered by collect_set, whose per-group
    * state is naturally bounded at |sources| (small and fixed), and
    * both the per-source sizes and the sorted s1<s2 pair expansion
    * derive from that small grouped table. No doc×doc pairs ever form;
    * a boilerplate shingle present in every source costs one
    * |sources|-element set and ≤|sources|²/2 expanded pair rows. The
    * previous distinct-then-self-join shape reshuffled the full
    * distinct-shingle table twice more (once per join side). Output is
    * one row per overlapping pair — O(|sources|²) regardless of corpus
    * size.
    */
  def sourceOverlap(docs: DataFrame, w: Int = 5): DataFrame = {
    val grouped = docs.select(col("source"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("source"), explode(ShingleHashes.longWindowHashes(
        expr("transform(toks, t -> xxhash64(t))"), w)).as("g"))
      .groupBy(col("g"))
      .agg(array_sort(collect_set(col("source"))).as("srcs"))
    val sizes = grouped.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = grouped
      .filter(size(col("srcs")) >= 2)
      .select(explode(expr(
        "flatten(transform(srcs, (x, i) -> transform(slice(srcs, i + 2, size(srcs)), " +
          "y -> named_struct('s1', x, 's2', y))))")).as("p"))
      .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("source").as("s1"), col("n").as("n1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("n").as("n2")), "s2")
      .select(col("s1"), col("s2"), col("n_shared"), col("n1"), col("n2"),
        round(col("n_shared").cast("double") /
          (col("n1") + col("n2") - col("n_shared")), 6).as("jaccard"))
  }

  /** Spark joins 64-bit shingle hashes where the oracle joins gram
    * strings — identical counts short of an xxhash64 collision (the
    * decontam_near convention).
    */
  val sourceOverlapQuery: QueryDef = QueryDef(
    "source_overlap",
    (s, dir) => sourceOverlap(Tables(s, dir, "documents")),
    Some("""WITH tk AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
      sh AS (SELECT DISTINCT source, array_to_string(toks[i : i + 4], ' ') AS g
        FROM tk, UNNEST(generate_series(1, greatest(len(toks) - 4, 0))) AS t(i)
        WHERE len(toks) >= 5),
      sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
      shared AS (SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_shared
        FROM sh a JOIN sh b USING (g) WHERE a.source < b.source GROUP BY 1, 2)
      SELECT s1, s2, n_shared, za.n AS n1, zb.n AS n2,
        round(CAST(n_shared AS DOUBLE) / (za.n + zb.n - n_shared), 6) AS jaccard
      FROM shared
      JOIN sizes za ON za.source = s1
      JOIN sizes zb ON zb.source = s2"""))

  /** Deterministic train/val/test split: bucket = first 32 bits of
    * md5(doc_id) mod 1000, train < `trainPm`, val < `valPm`, test
    * otherwise. A PURE MAP STAGE — no shuffle, no state: any executor
    * can place any doc, re-runs and late-arriving shards land in the
    * same split forever (position-based splits reshuffle every doc the
    * moment one upstream row appears), and the proportions hold per
    * source because md5 is uniform on the id space.
    */
  def splitAssign(docs: DataFrame, trainPm: Int = 900, valPm: Int = 950): DataFrame =
    docs.select(col("doc_id"), col("source"),
      (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 1000).as("bucket"))
      .select(col("doc_id"), col("source"),
        when(col("bucket") < trainPm, "train")
          .when(col("bucket") < valPm, "val")
          .otherwise("test").as("split"))

  val splitQuery: QueryDef = QueryDef(
    "curation_split",
    (s, dir) => splitAssign(Tables(s, dir, "documents")),
    Some("""SELECT doc_id, source,
        CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split
      FROM (SELECT doc_id, source,
        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS b
        FROM documents)"""))

  /** Sequential Poisson / priority sampling (Ohlsson 1998; Duffield et
    * al. 2007) — weighted sampling WITHOUT replacement: each doc draws a
    * deterministic uniform u ∈ (0,1] from the first 52 bits of
    * md5(doc_id) (exact in a double, identical in DuckDB via the same
    * hex prefix), gets priority ξ = u / w for weight w = n_chars + 1,
    * and the k smallest-ξ docs per language win — longer documents are
    * proportionally likelier to be kept, and the draw reproduces across
    * engines, runs, and late-arriving shards (each doc's ξ depends only
    * on itself). ξ is one IEEE division of exact inputs, so Spark and
    * DuckDB order candidates bit-identically — no transcendental
    * (`u^(1/w)` Efraimidis–Spirakis keys need pow/log, whose last-ulp is
    * libm-dependent; the u/w priority form is the established equivalent
    * that stays rational).
    *
    * Scale shape: per-group top-k as the salted two-stage rank — a local
    * row_number within (lang, doc_id mod 64) prunes to ≤64·k candidates
    * per language BEFORE the one per-language final rank, so the global
    * window never concentrates a 100 TB language onto a single task.
    */
  /** ξ = u / w priority per row: u a 52-bit md5-derived uniform of the
    * id (exact in a double, mirrorable in DuckDB via the same hex
    * prefix), w = weight + 1 clamped positive. One IEEE division of
    * exact inputs — engines order candidates bit-identically.
    */
  def priorityScores(df: DataFrame, idCol: String, weightCol: Column,
                     groupCol: Column): DataFrame = {
    val id = col(s"`$idCol`") // backtick: generic CLI inputs have arbitrary names
    val u = (conv(substring(md5(id.cast("string").cast("binary")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
    df.withColumn("grp", groupCol)
      .withColumn("xi", u / greatest(weightCol + lit(1), lit(1)).cast("double"))
  }

  /** k smallest-ξ rows per group as the salted two-stage rank: a local
    * row_number within (grp, id mod 64) prunes to ≤64·k candidates per
    * group BEFORE the one per-group final rank, so the global window
    * never concentrates a 100 TB group onto a single task. Priority
    * samples are MERGEABLE — topK(A ∪ B) = topK(topK(A) ∪ B) — which
    * is what makes the streaming fold below exact.
    */
  def priorityTopK(scored: DataFrame, idCol: String, k: Int): DataFrame = {
    val id = col(s"`$idCol`")
    val local = ScaleUtils.groupedTopK(
        scored.withColumn("salt", pmod(id, lit(64))),
        Seq(col("grp"), col("salt")), Seq(col("xi"), id), k, rankCol = "lrk")
      .drop("lrk", "salt")
    ScaleUtils.groupedTopK(local, Seq(col("grp")), Seq(col("xi"), id), k)
  }

  val prioritySample: QueryDef = QueryDef(
    "curation_priority_sample",
    (s, dir) => {
      val scored = priorityScores(Tables(s, dir, "documents"),
        "doc_id", col("n_chars"), col("lang"))
      priorityTopK(scored, "doc_id", 50)
        .select(col("grp").as("lang"), col("doc_id"), col("n_chars"),
          round(col("xi") * lit(1000000.0), 6).as("xi_ppm"),
          col("rk").cast("long").as("rk"))
    },
    Some("""WITH scored AS (SELECT lang, doc_id, n_chars,
        ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1.0)
          / 4503599627370496.0) / (n_chars + 1.0) AS xi
        FROM documents)
      SELECT lang, doc_id, n_chars, round(xi * 1000000.0, 6) AS xi_ppm,
        row_number() OVER (PARTITION BY lang ORDER BY xi, doc_id) AS rk
      FROM scored
      QUALIFY rk <= 50"""))

  /** Per-source quality-median gate — the "keep the better half of every
    * domain" cut of a pretraining filter, with the threshold derived
    * from the data itself rather than a global constant (per-group
    * cutoffs are what keep one boilerplate-heavy domain from eating the
    * whole quality budget). Threshold = the LOWER MEDIAN (value at rank
    * ⌈n/2⌉ in quality order) — rank selection, not interpolation,
    * because the two engines' quantile interpolation associativity is
    * not bit-pinned while rank math is exact.
    *
    * Scale shape: the median is computed from a VALUE HISTOGRAM, not a
    * per-doc sort — quality is round-6-quantized in [0,1], so
    * groupBy(source, quality) is map-side combinable and the cumulative
    * window that locates the rank runs over ≤10^6 aggregated rows per
    * source regardless of corpus size. No corpus-wide window, no
    * per-source sort of raw docs; the tiny threshold table broadcasts
    * back onto the scan. (The sketch alternative, approx_percentile, is
    * graded separately by approx_quantile_audit — this operator pins the
    * exact semantics.)
    */
  val qualityCutoff: QueryDef = QueryDef(
    "curation_quality_cutoff",
    (s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          TextOps.qualityScore(col("text")).as("quality"))
      val hist = scored.groupBy(col("source"), col("quality"))
        .agg(count(lit(1)).as("c"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("source")).orderBy(col("quality"))))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
      val thr = cum
        .filter(col("cum") - col("c") < expr("(n + 1) div 2")
          && expr("(n + 1) div 2") <= col("cum"))
        .select(col("source"), col("quality").as("threshold"))
      scored.join(broadcast(thr), "source")
        .groupBy(col("source"))
        .agg(max(col("threshold")).as("threshold"),
          count(lit(1)).as("n_docs"),
          sum(when(col("quality") > col("threshold"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("quality") > col("threshold"), col("n_chars"))
            .otherwise(0L)).as("kept_chars"))
    },
    Some("""WITH scored AS (SELECT doc_id, source, n_chars,
        round(least(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE) / 100.0, 1.0) * 0.5
          + (CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in)\b')) AS DOUBLE)
             / greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE), 1.0)) * 0.5, 6) AS quality
        FROM documents),
      hist AS (SELECT source, quality, COUNT(*) AS c FROM scored GROUP BY 1, 2),
      cum AS (SELECT source, quality, c,
          SUM(c) OVER (PARTITION BY source ORDER BY quality) AS cum,
          SUM(c) OVER (PARTITION BY source) AS n
        FROM hist),
      thr AS (SELECT source, quality AS threshold FROM cum
        WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum)
      SELECT s.source, MAX(t.threshold) AS threshold, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN s.quality > t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN s.quality > t.threshold THEN s.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      FROM scored s JOIN thr t USING (source)
      GROUP BY s.source"""))

  val all: Seq[QueryDef] =
    Seq(domainBlocklist, domainQuota, dedupParagraph, stratifiedSample,
      shardShuffle, mixSources, badwords, cdcChunks, crawlDiff,
      temperatureMix, crawlMergeQuery, sourceOverlapQuery, splitQuery,
      prioritySample, qualityCutoff)
}
