package graft.operators

import graft.util.Checkpoints.ReliableOps
import graft.QueryDef
import graft.functions.GraftFunctions._
import graft.functions.NfcNormalize.nfc
import graft.util.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators over the `documents` table: tokenization + TF/DF
  * (cc-pyspark word_count.py:25-39), exact dedup, fingerprinting, quality
  * scoring, language-ID heuristic, token counting — the text half of a
  * training-data pipeline. All expressions are Catalyst built-ins (one
  * narrow scan → hash agg; no UDFs, no collects).
  */
object TextOps {

  /** P6 word count with per-word doc frequency (word_count.py:25-39:
    * `(word, (tf, df))`). explode → two-level hash agg; the partial agg
    * before the shuffle is the reference's per-doc Counter, for free.
    */
  val p6WordCount: QueryDef = QueryDef(
    "p6_word_count",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("word"))
      .limit(100),
    Some("""SELECT word, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df FROM (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents)
      GROUP BY word ORDER BY tf DESC, word LIMIT 100"""))

  /** Exact dedup: content-hash groupBy keeping the lowest doc_id. One
    * shuffle on the 128-bit digest; survives any scale (key cardinality
    * ≈ distinct documents).
    */
  val dedupExact: QueryDef = QueryDef(
    "dedup_exact",
    (s, dir) => Tables(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("sig"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies")),
    Some("""SELECT md5(text) AS sig, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text)"""))

  /** Document fingerprint (normalized-content hash) uniqueness per source. */
  val fpUniqueness: QueryDef = QueryDef(
    "fp_uniqueness",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_unique"), count(lit(1)).as("n_docs")),
    Some("""SELECT source,
      COUNT(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS n_unique,
      COUNT(*) AS n_docs
      FROM documents GROUP BY source"""))

  /** Token counting per source (BPE-ish proxy: ASCII word tokens). */
  val tokenCounts: QueryDef = QueryDef(
    "token_counts",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("source"), size(tokens(col("text"))).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("total_tokens"), count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tokens")),
    Some("""SELECT source,
      CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens,
      COUNT(*) AS n_docs,
      MAX(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS max_tokens
      FROM documents GROUP BY source"""))

  /** GPT-2-style pre-tokenizer pattern, restricted to the RE2-compatible
    * subset (no lookahead) so Spark's Java regex and DuckDB's RE2 agree:
    * contractions, space-prefixed letter runs, digit runs, punctuation
    * runs. A BPE merge table only subdivides these pieces, so the piece
    * count is a fast lower-bound estimate; `token_counts_bpe_exact`
    * applies a real merge table for true counts.
    */
  private val BpePretokenPattern = graft.text.Bpe.PretokenPattern

  /** Token counting with the BPE-ish pre-tokenizer (the whitespace/ASCII
    * variant is `token_counts`): per-source totals for data budgeting.
    */
  val tokenCountsBpe: QueryDef = QueryDef(
    "token_counts_bpe",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("source"),
        size(regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0))).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("total_tokens"), count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_tokens")),
    Some("""SELECT source,
      CAST(SUM(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS BIGINT) AS total_tokens,
      COUNT(*) AS n_docs,
      MAX(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))) AS max_tokens
      FROM documents GROUP BY source"""))

  /** Email/phone/IPv4 patterns for PII redaction, restricted to the
    * RE2-compatible subset (no lookarounds) so Spark's Java regex and the
    * DuckDB oracle match byte for byte. Order matters: emails first so a
    * phone-like digit run inside an address is not double-redacted.
    */
  private val PiiEmail = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PiiPhone = """(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"""
  private val PiiIpv4 = """\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"""

  /** PII redaction — the standard pretraining scrub (emails, phone
    * numbers, IPv4 addresses → typed placeholders) as chained
    * regexp_replace, plus per-source counts of what was redacted. Pure
    * map-side column work: no shuffle until the small accounting agg, so
    * at 100 TB this runs at scan speed alongside the quality filters.
    * The synthetic corpus contains no PII (counts are zero here — the
    * oracle still checks the transformation end to end); PiiScrubSpec
    * drives planted emails/phones/IPs through the same expressions.
    */
  val piiScrub: QueryDef = QueryDef(
    "text_pii_scrub",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(regexp_extract_all(col("text"), lit(PiiEmail), lit(0))).as("n_email"),
          size(regexp_extract_all(col("text"), lit(PiiPhone), lit(0))).as("n_phone"),
          size(regexp_extract_all(col("text"), lit(PiiIpv4), lit(0))).as("n_ipv4"),
          length(regexp_replace(regexp_replace(regexp_replace(col("text"),
            PiiEmail, "<EMAIL>"), PiiPhone, "<PHONE>"), PiiIpv4, "<IP>"))
            .as("clean_len"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("emails"), sum(col("n_phone")).as("phones"),
          sum(col("n_ipv4")).as("ipv4s"), sum(col("clean_len")).as("clean_chars"))
    },
    Some("""WITH d AS (SELECT doc_id, source,
        len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        len(regexp_extract_all(text, '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone,
        len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n_ipv4,
        length(regexp_replace(regexp_replace(regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
          '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g')) AS clean_len
      FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n_email) AS BIGINT) AS emails, CAST(SUM(n_phone) AS BIGINT) AS phones,
        CAST(SUM(n_ipv4) AS BIGINT) AS ipv4s, CAST(SUM(clean_len) AS BIGINT) AS clean_chars
      FROM d GROUP BY source"""))

  /** True BPE token counts under a merge table learned from the corpus
    * itself (graft.text.Bpe: distributed vocab pass, driver-side Sennrich
    * training on the bounded aggregate, broadcast ranks applied by a
    * codegen'd native expression). Rows-only: the merge loop is not
    * ANSI-SQL-expressible; BpeSpec pins the algorithm to hand-computed
    * goldens (the Sennrich low/lower/newest/widest example) and asserts
    * exact ≥ the piece-count lower bound per source.
    */
  /** Session-cached trained merge table — fn and oracle generator share
    * one training run (the VectorOps.cachedIvfCentroids rationale;
    * training is deterministic anyway: exact counts, lexicographic
    * tiebreaks).
    */
  private val trainedMerges = new java.util.concurrent.ConcurrentHashMap[
    String, Vector[(String, String)]]()

  private def cachedMerges(s: org.apache.spark.sql.SparkSession, dir: String): Vector[(String, String)] =
    graft.util.Caches.fill(trainedMerges, s.sparkContext.applicationId + ":" + dir)(graft.text.Bpe.trainFromCorpus(Tables(s, dir, "documents"), nMerges = 200))

  /** DuckDB-escaped (pre-token pattern is already proven RE2-compatible
    * by the token_counts_bpe oracle).
    */
  private val BpePretokenSqlPattern: String =
    """'''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'"""

  val tokenCountsBpeExact: QueryDef = QueryDef(
    "token_counts_bpe_exact",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val ranks = graft.text.Bpe.ranksOf(cachedMerges(s, dir))
      docs.select(col("source"),
          graft.text.Bpe.bpeCountTokens(
            regexp_extract_all(col("text"), lit(BpePretokenPattern), lit(0)),
            ranks).as("n_tok"))
        .groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tokens"), count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_tokens"))
    },
    // Full replay of the Sennrich/GPT-2 encode loop: the trained merge
    // table ships as a MAP literal with [left, right] list keys; a
    // recursive CTE applies ONE leftmost lowest-rank merge per step —
    // provably equivalent to Bpe.encode's merge-all-per-pair loop,
    // because any pair involving a freshly created composite symbol was
    // trained AFTER (so ranks BELOW) the merge that created it, so the
    // leftmost-minimum choice never diverges. Pieces reduce over their
    // DISTINCT set (the same memoization the kernel's piece cache
    // applies), then counts rejoin per doc by multiplicity.
    oracleGen = Some((s, dir) => {
      val merges = cachedMerges(s, dir)
      def esc(x: String) = x.replace("'", "''")
      val mapLit =
        if (merges.isEmpty) "MAP {[' ',' ']: 0}" // unreachable key
        else merges.zipWithIndex.map { case ((a, b), r) =>
          s"['${esc(a)}','${esc(b)}']: $r"
        }.mkString("MAP {", ", ", "}")
      def rankList(symsExpr: String) =
        s"list_transform(range(1, len($symsExpr)), pi -> " +
          s"coalesce(map_extract($mapLit, [$symsExpr[pi], $symsExpr[pi+1]])[1], 999999))"
      s"""WITH RECURSIVE
      pz AS (SELECT doc_id, source, unnest(regexp_extract_all(text, $BpePretokenSqlPattern)) AS piece
             FROM documents),
      pieces0 AS (SELECT DISTINCT piece FROM pz),
      st(piece, syms) AS (
        SELECT piece, list_transform(range(1, length(piece)+1), ci -> piece[ci])
        FROM pieces0
        UNION ALL
        SELECT piece,
          syms[1 : bi - 1] || [syms[bi] || syms[bi + 1]] || syms[bi + 2 : len(syms)]
        FROM (
          SELECT piece, syms,
                 list_position(rl, list_min(rl)) AS bi, list_min(rl) AS mr
          FROM (SELECT piece, syms, ${rankList("syms")} AS rl FROM st)
        ) WHERE mr < 999999
      ),
      done AS (SELECT piece, len(syms) AS ntok FROM (
          SELECT piece, syms, list_min(${rankList("syms")}) AS mn FROM st)
          WHERE mn IS NULL OR mn = 999999),
      perdoc AS (SELECT p.doc_id, p.source, SUM(dn.ntok) AS n_tok
                 FROM pz p JOIN done dn ON dn.piece = p.piece
                 GROUP BY p.doc_id, p.source),
      withz AS (SELECT a.source, coalesce(pd.n_tok, 0) AS n_tok
                FROM (SELECT doc_id, source FROM documents) a
                LEFT JOIN perdoc pd ON pd.doc_id = a.doc_id)
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             COUNT(*) AS n_docs, CAST(MAX(n_tok) AS BIGINT) AS max_tokens
      FROM withz GROUP BY source"""
    }))

  /** The [[textQuality]] composite score as one reusable column — the
    * SAME arithmetic (operand order, association, round-6) as the
    * `quality` column below, so gates built on it (e.g.
    * [[Curation.qualityCutoff]]) score documents identically to the
    * text_quality oracle.
    */
  def qualityScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nTok = size(tokens(text)).cast(DoubleType)
    val stops = size(regexp_extract_all(lower(text),
      lit("\\b(the|a|of|and|to|in)\\b"), lit(0))).cast(DoubleType)
    round(least(nTok / lit(100.0), lit(1.0)) * lit(0.5)
      + stops / greatest(nTok, lit(1.0)) * lit(0.5), 6)
  }

  /** Per-document quality scoring: token count, alpha density, stopword
    * ratio — the length/punct/stopword heuristics of a pretraining-data
    * quality filter, as pure column arithmetic (deterministic doubles:
    * single IEEE expression per row, no aggregation order involved).
    */
  val textQuality: QueryDef = QueryDef(
    "text_quality",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          size(tokens(col("text"))).as("n_tok"),
          length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("alpha_chars"),
          size(expr("regexp_extract_all(lower(text), '\\\\b(the|a|of|and|to|in)\\\\b', 0)")).as("stop_hits"))
      d.select(col("doc_id"), col("n_tok"), col("alpha_chars"), col("stop_hits"),
        round(col("alpha_chars").cast(DoubleType) / greatest(col("n_tok"), lit(1)), 6).as("avg_token_len"),
        round(col("stop_hits").cast(DoubleType) / greatest(col("n_tok"), lit(1)), 6).as("stop_ratio"),
        round(least(col("n_tok").cast(DoubleType) / lit(100.0), lit(1.0)) * lit(0.5)
          + (col("stop_hits").cast(DoubleType) / greatest(col("n_tok"), lit(1))) * lit(0.5), 6).as("quality"))
    },
    Some("""WITH d AS (SELECT doc_id,
        len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
        length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
        len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in)\b')) AS stop_hits
      FROM documents)
      SELECT doc_id, n_tok, alpha_chars, stop_hits,
        round(CAST(alpha_chars AS DOUBLE) / greatest(n_tok, 1), 6) AS avg_token_len,
        round(CAST(stop_hits AS DOUBLE) / greatest(n_tok, 1), 6) AS stop_ratio,
        round(least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.5
          + (CAST(stop_hits AS DOUBLE) / greatest(n_tok, 1)) * 0.5, 6) AS quality
      FROM d"""))

  /** Stop words for the Gopher "contains ≥2 stop words" rule (Rae et al.
    * 2021 §A1.1 lists exactly these eight).
    */
  private val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Symbols counted by the Gopher symbol-to-word-ratio rule: hash and
    * ellipsis, where the paper's "ellipsis" covers both the `…` glyph and
    * the three-dot spelling. Alternation keeps Java regex and RE2
    * identical (non-overlapping, leftmost match).
    */
  private val GopherSymbolPattern = """#|\.\.\.|…"""

  /** Gopher-style repetition/format quality rules (Rae et al. 2021,
    * "Scaling Language Models", §A1.1 — the public rule set behind most
    * pretraining corpus filters): word-count bounds, mean word length
    * bounds, symbol-to-word ratio, bullet-line fraction, duplicate-line
    * fraction (by count AND by character share — one repeated giant line
    * passes the count rule but not the char rule), alpha-word fraction
    * (≥80% of words contain a letter), stop-word presence (≥2 distinct
    * of the paper's eight). Pure column
    * arithmetic over one line split and one token pass per document; the
    * thresholds are the paper's.
    */
  val qualityGopher: QueryDef = QueryDef(
    "quality_gopher",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          tokens(col("text")).as("toks"),
          length(regexp_replace(lower(col("text")), "[^a-z0-9]", "")).as("alpha_chars"),
          size(regexp_extract_all(col("text"), lit(GopherSymbolPattern), lit(0))).as("n_symbols"),
          expr("split(text, '\n')").as("lines"))
        .select(col("doc_id"), size(col("toks")).as("n_words"), col("n_symbols"),
          round(col("alpha_chars").cast(DoubleType) /
            greatest(size(col("toks")), lit(1)), 6).as("mean_word_len"),
          round(col("n_symbols").cast(DoubleType) /
            greatest(size(col("toks")), lit(1)), 6).as("symbol_ratio"),
          round(size(expr("filter(lines, l -> l LIKE '-%' OR l LIKE '*%')"))
            .cast(DoubleType) / greatest(size(col("lines")), lit(1)), 6)
            .as("bullet_frac"),
          round(lit(1.0) - size(array_distinct(col("lines"))).cast(DoubleType) /
            greatest(size(col("lines")), lit(1)), 6).as("dup_line_frac"),
          round(lit(1.0) -
            expr("aggregate(array_distinct(lines), 0L, (a, l) -> a + length(l))")
              .cast(DoubleType) /
            greatest(expr("aggregate(lines, 0L, (a, l) -> a + length(l))"), lit(1L)), 6)
            .as("dup_line_char_frac"),
          round(size(filter(col("toks"), t => t.rlike("[a-z]"))).cast(DoubleType) /
            greatest(size(col("toks")), lit(1)), 6).as("alpha_word_frac"),
          size(array_distinct(filter(col("toks"), t => t.isin(GopherStops: _*))))
            .as("stop_hits"))
      d.withColumn("passes",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3, 10) &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_frac") <= 0.9 &&
          col("dup_line_frac") <= 0.3 &&
          col("dup_line_char_frac") <= 0.2 &&
          col("alpha_word_frac") >= 0.8 &&
          col("stop_hits") >= 2)
    },
    Some("""WITH d AS (SELECT doc_id,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
        length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS alpha_chars,
        len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_symbols,
        split(text, chr(10)) AS lines
      FROM documents),
      m AS (SELECT doc_id, len(toks) AS n_words, n_symbols,
        round(CAST(alpha_chars AS DOUBLE) / greatest(len(toks), 1), 6) AS mean_word_len,
        round(CAST(n_symbols AS DOUBLE) / greatest(len(toks), 1), 6) AS symbol_ratio,
        round(CAST(len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%')) AS DOUBLE)
          / greatest(len(lines), 1), 6) AS bullet_frac,
        round(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
          / greatest(len(lines), 1), 6) AS dup_line_frac,
        round(1.0 - CAST(coalesce(list_sum(list_transform(list_distinct(lines),
            l -> length(l))), 0) AS DOUBLE)
          / greatest(CAST(coalesce(list_sum(list_transform(lines,
            l -> length(l))), 0) AS BIGINT), 1), 6) AS dup_line_char_frac,
        round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
          / greatest(len(toks), 1), 6) AS alpha_word_frac,
        len(list_distinct(list_filter(toks,
          t -> t IN ('the','be','to','of','and','that','have','with')))) AS stop_hits
      FROM d)
      SELECT doc_id, n_words, n_symbols, mean_word_len, symbol_ratio, bullet_frac,
        dup_line_frac, dup_line_char_frac, alpha_word_frac, stop_hits,
        (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3 AND 10)
          AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
          AND dup_line_frac <= 0.3 AND dup_line_char_frac <= 0.2
          AND alpha_word_frac >= 0.8 AND stop_hits >= 2 AS passes
      FROM m"""))

  /** Language-ID heuristic: per-language stopword hit counts, argmax with a
    * fixed preference order (en > fr > es > de > unknown). N-gram/stopword
    * profiling is the standard cheap lang-id; here the profiles are tiny
    * and the whole classifier is one codegen'd CASE expression.
    */
  val langIdHeuristic: QueryDef = QueryDef(
    "langid_heuristic",
    (s, dir) => {
      // ONE tokenize pass per document; each language profile is a
      // membership count over the token array (codegen'd filter+size), not
      // a separate full-text regex scan — 4× less scan work than the
      // regex-per-language formulation at identical token semantics.
      def hits(words: Seq[String]) = {
        val set = words.map(w => s"'$w'").mkString(", ")
        size(expr(s"filter(toks, t -> t IN ($set))"))
      }
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        .select(
          col("doc_id"), col("lang"),
          hits(Seq("the", "and", "of", "to", "is")).as("en_hits"),
          hits(Seq("le", "la", "les", "et", "est")).as("fr_hits"),
          hits(Seq("el", "los", "las", "es", "y")).as("es_hits"),
          hits(Seq("der", "die", "das", "und", "ist")).as("de_hits"))
      scored.withColumn("predicted",
        when(col("en_hits") + col("fr_hits") + col("es_hits") + col("de_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("fr_hits") && col("en_hits") >= col("es_hits")
            && col("en_hits") >= col("de_hits"), lit("en"))
          .when(col("fr_hits") >= col("es_hits") && col("fr_hits") >= col("de_hits"), lit("fr"))
          .when(col("es_hits") >= col("de_hits"), lit("es"))
          .otherwise(lit("de")))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
    },
    Some("""WITH tk AS (SELECT doc_id, lang,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      h AS (SELECT doc_id, lang,
        len(list_filter(toks, t -> t IN ('the','and','of','to','is'))) AS en_hits,
        len(list_filter(toks, t -> t IN ('le','la','les','et','est'))) AS fr_hits,
        len(list_filter(toks, t -> t IN ('el','los','las','es','y'))) AS es_hits,
        len(list_filter(toks, t -> t IN ('der','die','das','und','ist'))) AS de_hits
      FROM tk),
      p AS (SELECT lang, CASE
        WHEN en_hits + fr_hits + es_hits + de_hits = 0 THEN 'unknown'
        WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
        WHEN fr_hits >= es_hits AND fr_hits >= de_hits THEN 'fr'
        WHEN es_hits >= de_hits THEN 'es'
        ELSE 'de' END AS predicted FROM h)
      SELECT lang, predicted, COUNT(*) AS n FROM p GROUP BY lang, predicted"""))

  /** Unicode NFC normalization pass ([[graft.functions.NfcNormalize]],
    * native codegen'd expression — no UDF): per-source accounting of how
    * many documents change under canonical composition and the size
    * delta. Pure map-side column work before one small agg, so at 100 TB
    * this runs at scan speed like the other text passes. The synthetic
    * corpus is ASCII (the fast path), so a planted row with a combining
    * accent (e+U+0301), the U+212B ANGSTROM canonical singleton and a
    * precomposed survivor is unioned in on BOTH engines — the oracle
    * exercises real composition, not just the identity path.
    */
  val textNormalize: QueryDef = QueryDef(
    "text_normalize",
    (s, dir) => {
      import s.implicits._
      val planted = Seq((-1L, "planted", "cafe\u0301 \u212B nai\u0308ve caf\u00e9 plain"))
        .toDF("doc_id", "source", "text")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .unionByName(planted)
        .select(col("source"), col("text"), nfc(col("text")).as("norm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("norm") =!= col("text"), 1).otherwise(0)).as("n_changed"),
          sum(length(col("text"))).as("raw_chars"),
          sum(length(col("norm"))).as("norm_chars"))
    },
    Some("""WITH d AS (
        SELECT doc_id, source, text FROM documents
        UNION ALL
        SELECT -1, 'planted',
          'cafe' || chr(769) || ' ' || chr(8491) || ' nai' || chr(776) || 've caf' || chr(233) || ' plain'),
      n AS (SELECT source, text, nfc_normalize(text) AS norm FROM d)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        CAST(SUM(length(text)) AS BIGINT) AS raw_chars,
        CAST(SUM(length(norm)) AS BIGINT) AS norm_chars
      FROM n GROUP BY source"""))

  /** BM25 relevance ranking (Robertson/Spärck Jones, the classic quality
    * baseline for retrieval-style corpus queries): top-10 documents per
    * query term, k1=1.2 b=0.75. Fully relational — tf from one token
    * explode filtered to the query terms BEFORE the shuffle (the filter
    * rides the scan stage, so the shuffled stream is |terms|·|matching
    * docs|, not the corpus token stream), df and the 1-row corpus stats
    * broadcast back onto it, WindowGroupLimit bounds the per-term top-10
    * to an O(10) heap per task. avgdl divides an exact integer token sum,
    * so the score is order-independent and reproducible at any
    * parallelism; ranking uses the 6dp-rounded score (doc_id tiebreak) so
    * Spark and the DuckDB oracle agree on every boundary.
    */
  val bm25: QueryDef = QueryDef(
    "text_bm25",
    (s, dir) => {
      val terms = Seq("join", "vector", "filter", "dup")
      val k1 = 1.2
      val b = 0.75
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
      val stats = d.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      // tf is |terms| × |matching docs| — bounded and tiny — but it is
      // consumed by BOTH df and the scoring join, and un-checkpointed
      // each consumer re-ran the tokenize+explode corpus pass; the
      // eager stable checkpoint caps the query at two tokenize passes
      // (the stats aggregate and this one)
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .stableCheckpoint()
      val df = tf.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(broadcast(df), Seq("term")).crossJoin(broadcast(stats))
        .select(col("term"), col("doc_id"),
          round(
            log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
              (col("tf") * (k1 + 1)) /
              (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6).as("score"))
      val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
    },
    Some("""WITH d AS (SELECT doc_id,
        len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS dl,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      s AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
      tf AS (SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
        WHERE term IN ('join','vector','filter','dup') GROUP BY term, doc_id, dl),
      df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      sc AS (SELECT tf.term, tf.doc_id,
        round(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tf.tf * 2.2)
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / s.avgdl)), 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN s),
      r AS (SELECT term, doc_id, score,
        CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS INT) AS rk
        FROM sc)
      SELECT term, doc_id, score, rk FROM r WHERE rk <= 10"""))

  /** Flesch reading-ease scoring (the classic readability quality
    * signal; Kincaid et al. 1975): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words), with sentences counted as [.!?] runs and
    * syllables approximated as vowel groups — the standard regexp
    * approximation, identical RE2-safe patterns on both engines. Per-doc
    * scores round to 6dp BEFORE aggregation, and the per-source mean
    * accumulates in exact decimal (GraftFunctions determinism note), so
    * the result is bit-reproducible at any parallelism. Map-side column
    * work → one small agg: scan speed at 100 TB.
    */
  val readability: QueryDef = QueryDef(
    "text_readability",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("source"),
          greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))), lit(1))
            .cast(DoubleType).as("n_sent"),
          greatest(size(tokens(col("text"))), lit(1)).cast(DoubleType).as("n_words"),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
            .cast(DoubleType).as("n_syll"))
        .select(col("source"),
          round(lit(206.835) - lit(1.015) * col("n_words") / col("n_sent")
            - lit(84.6) * col("n_syll") / col("n_words"), 6).as("fk"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(davg(col("fk")), 6).as("avg_fk"),
          sum(when(col("fk") >= 70.0, 1).otherwise(0)).as("n_easy"),
          sum(when(col("fk") < 50.0, 1).otherwise(0)).as("n_hard"))
    },
    Some("""WITH d AS (SELECT source,
        round(206.835
          - 1.015 * (CAST(greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS DOUBLE)
                     / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
          - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                    / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1)), 6) AS fk
      FROM documents)
      SELECT source, COUNT(*) AS n_docs,
        round(CAST(SUM(CAST(fk AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS avg_fk,
        CAST(SUM(CASE WHEN fk >= 70.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_easy,
        CAST(SUM(CASE WHEN fk < 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard
      FROM d GROUP BY source"""))

  /** Token-distribution Shannon entropy per document — the standard
    * gibberish / repetition filter (low entropy = boilerplate or a
    * repeated token; used alongside the Gopher rules in public cleaning
    * recipes). Computed as H = log2(n) − (Σ c·log2 c)/n so every
    * floating-point term is a function of INTEGER counts: each c·log2 c
    * rounds to 6dp (identical half-up semantics on both engines for
    * positive values) and then sums in exact decimal — per-doc entropy is
    * bit-reproducible at any parallelism, as is the decimal-accumulated
    * per-source mean. Same two-shuffle shape as p6_word_count: (doc,word)
    * hash agg then doc hash agg, key cardinality ≈ corpus vocabulary ×
    * docs — no skewable key at 100 TB.
    */
  /** Per-document token entropy (doc_id, source, entropy) — shared by the
    * registered query and the `curate --min_entropy` filter.
    */
  def docEntropy(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(25, 6)
    docs
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c")).as("n"),
        sum(round(col("c") * log2(col("c")), 6).cast(dec)).as("s"))
      .select(col("doc_id"), col("source"),
        round(log2(col("n")) - col("s").cast(DoubleType) / col("n"), 6).as("entropy"))
  }

  val textEntropy: QueryDef = QueryDef(
    "text_entropy",
    (s, dir) => {
      docEntropy(Tables(s, dir, "documents"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(davg(col("entropy")), 6).as("avg_entropy"),
          sum(when(col("entropy") < 4.0, 1).otherwise(0)).as("n_low_entropy"))
    },
    Some("""WITH wc AS (SELECT doc_id, source, word, COUNT(*) AS c
        FROM (SELECT doc_id, source,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
              FROM documents)
        GROUP BY doc_id, source, word),
      e AS (SELECT doc_id, source,
          round(log2(SUM(c))
            - CAST(SUM(CAST(round(c * log2(c), 6) AS DECIMAL(25,6))) AS DOUBLE)
              / SUM(c), 6) AS entropy
        FROM wc GROUP BY doc_id, source)
      SELECT source, COUNT(*) AS n_docs,
        round(CAST(SUM(CAST(entropy AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS avg_entropy,
        CAST(SUM(CASE WHEN entropy < 4.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_entropy
      FROM e GROUP BY source"""))

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS algorithm):
    * hash every char k-gram of the normalized text, slide a w-hash
    * window, keep each window's MINIMUM hash — guarantees any shared
    * substring of length ≥ w+k-1 contributes at least one shared
    * fingerprint, at ~2/(w+1) the density of full k-gram sets. Reports,
    * per source, docs fingerprinted, distinct fingerprints, and
    * fingerprints shared across ≥2 docs (the plagiarism/boilerplate
    * signal).
    *
    * Engine parity: the gram hash is a base-131 polynomial mod 1e9+7 —
    * plain modular arithmetic DuckDB spells out term-by-term
    * (ord(substr)·131^j sums), while the Spark side runs the native
    * one-pass deque kernel (HashKernels.winnow; the md5-string HOF form
    * this replaces benched ~8 s at sf0.1, the kernel ~1 s). The text is
    * ASCII after normalization, so DuckDB's char positions and the
    * kernel's byte offsets coincide. Per-doc work is one codegen'd scan
    * projection; the only shuffles are the fingerprint-df aggregation
    * and the per-source rollup, both keyed on 8-byte values.
    */
  val fpWinnowing: QueryDef = QueryDef(
    "fp_winnowing",
    (s, dir) => {
      val k = 5; val w = 8
      val fps = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("t"))
        .filter(length(col("t")) >= k + w - 1)
        .select(col("doc_id"), col("source"),
          // kernel output is already per-doc distinct — no post-explode
          // distinct(), so the fingerprint stream shuffles exactly once
          // (the df aggregation)
          explode(graft.functions.ShingleHashes.winnowFingerprints(col("t"), k, w)).as("fp"))
        // consumed twice (the df aggregate and the rollup join) — the
        // eager stable checkpoint runs the normalize+winnow kernel scan
        // once; un-checkpointed, both consumers re-ran it
        .stableCheckpoint()
      val df = fps.groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      fps.join(df, "fp")
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs_fp"),
          countDistinct(col("fp")).as("n_fps"),
          countDistinct(when(col("nd") > 1, col("fp"))).as("n_shared_fps"))
    },
    Some("""WITH d AS (SELECT doc_id, source,
        trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        FROM documents),
      g AS (SELECT doc_id, source, i,
          (CAST(ord(substr(t, i, 1)) AS BIGINT) * 294499921
           + ord(substr(t, i+1, 1)) * 2248091
           + ord(substr(t, i+2, 1)) * 17161 + ord(substr(t, i+3, 1)) * 131
           + ord(substr(t, i+4, 1))) % 1000000007 AS h
        FROM d, unnest(generate_series(1, len(t) - 4)) AS s(i)
        WHERE len(t) >= 12),
      wmin AS (SELECT doc_id, source, i,
          MIN(h) OVER (PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
          COUNT(*) OVER (PARTITION BY doc_id) AS m
        FROM g),
      fps AS (SELECT DISTINCT doc_id, source, fp
        FROM wmin WHERE i <= m - 7),
      df AS (SELECT fp, COUNT(*) AS nd FROM fps GROUP BY fp)
      SELECT source,
        COUNT(DISTINCT doc_id) AS n_docs_fp,
        COUNT(DISTINCT fp) AS n_fps,
        COUNT(DISTINCT CASE WHEN nd > 1 THEN fp END) AS n_shared_fps
      FROM fps JOIN df USING (fp)
      GROUP BY source"""))

  /** Per-source vocabulary statistics: token mass, distinct types,
    * hapax legomena, type-token ratio — the standard corpus profile
    * read before tokenizer training and mixture weighting (a source
    * whose TTR collapses is templated boilerplate; a hapax-heavy one
    * is OCR noise).
    *
    * Scale shape: one tokenize scan → two hash aggregations, both with
    * map-side partial aggregation; the intermediate key space is
    * (source, type) — bounded by vocabulary, not corpus — and nothing
    * is quadratic or collected.
    */
  def vocabStats(docs: DataFrame): DataFrame = {
    val tf = docs.select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("source")).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      // ratio fixed to 6dp via integer arithmetic: floor(1e6*types/tokens)/1e6
      // is bit-exact across engines, where round(double, 6) is not — Spark
      // rounds through BigDecimal HALF_UP while DuckDB rounds in binary
      // floating point, and the two can differ by an ulp near a tie.
      .withColumn("type_token_ratio",
        expr("CAST(n_types * 1000000 DIV n_tokens AS DOUBLE) / 1000000.0"))
      .orderBy(col("source"))
  }

  // oracle sums are CAST to BIGINT: DuckDB's bare SUM over integers
  // returns HUGEINT (arrow decimal128), and the driver's hash is
  // value-TYPE-sensitive — Spark emits int64, so an uncast oracle
  // hash-mismatches on bit-identical values
  val vocabStatsQuery: QueryDef = QueryDef(
    "text_vocab_stats",
    (s, dir) => vocabStats(Tables(s, dir, "documents")),
    Some("""WITH tf AS (
        SELECT source, t, COUNT(*) AS c
        FROM (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
              FROM documents)
        GROUP BY source, t)
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        CAST((COUNT(*) * 1000000) // SUM(c) AS DOUBLE) / 1000000.0 AS type_token_ratio
      FROM tf GROUP BY source ORDER BY source"""))

  /** Gopher n-gram repetition rules (Rae et al. 2021 §A1.1, Table A1 —
    * the half quality_gopher's line-level rules don't cover): fraction
    * of characters inside the single most-covering n-gram for n=2..4
    * (thresholds 0.20/0.18/0.16) and inside DUPLICATED n-grams for
    * n=5..10 (0.15/0.14/0.13/0.12/0.11/0.10). The RedPajama/Dolma-class
    * cleaning stacks run exactly this filter set over whole corpora.
    *
    * Scale shape: the statistics are a pure per-document function, so
    * they run as ONE map stage — a native kernel
    * ([[graft.functions.TextKernels]]) does the nine n-gram passes per
    * document in a JIT-compiled loop and returns 10 longs; nothing is
    * exploded or shuffled (the first cut exploded (doc, n, gram) and
    * paid three hash-agg exchanges of string keys — 10.3 s at sf0.1 vs
    * ~0.3 s fused; the DuckDB oracle still replays the exploded form
    * and hash-matches, which is the cross-check that the kernel IS the
    * declarative semantics). "Top" is MAX(count × gram chars) — the
    * n-gram covering the most characters — which is tie-free across
    * engines where "most frequent, break ties arbitrarily" is not.
    * Char counts exclude the joining spaces; ratios are fixed to 6dp by
    * integer arithmetic (bit-exact on both engines, see vocabStats).
    * Docs with < 2 tokens have nothing to measure and emit no row on
    * either engine.
    */
  val textRepetition: QueryDef = QueryDef(
    "text_repetition",
    (s, dir) => {
      val stats = Tables(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          graft.functions.TextKernels.repetitionStats(col("toks")).as("r"))
        .select(col("doc_id"), col("r")(0).as("total_chars"),
          col("r")(1).as("t2"), col("r")(2).as("t3"), col("r")(3).as("t4"),
          col("r")(4).as("d5"), col("r")(5).as("d6"), col("r")(6).as("d7"),
          col("r")(7).as("d8"), col("r")(8).as("d9"), col("r")(9).as("d10"))
      def f(src: String, out: String) = expr(
        s"CAST(coalesce($src, 0) * 1000000 DIV greatest(total_chars, 1) AS DOUBLE) / 1000000.0")
        .as(out)
      stats.select(col("doc_id"),
          f("t2", "top_2gram_frac"), f("t3", "top_3gram_frac"),
          f("t4", "top_4gram_frac"), f("d5", "dup_5gram_frac"),
          f("d6", "dup_6gram_frac"), f("d7", "dup_7gram_frac"),
          f("d8", "dup_8gram_frac"), f("d9", "dup_9gram_frac"),
          f("d10", "dup_10gram_frac"))
        .withColumn("passes",
          col("top_2gram_frac") <= 0.20 && col("top_3gram_frac") <= 0.18 &&
            col("top_4gram_frac") <= 0.16 && col("dup_5gram_frac") <= 0.15 &&
            col("dup_6gram_frac") <= 0.14 && col("dup_7gram_frac") <= 0.13 &&
            col("dup_8gram_frac") <= 0.12 && col("dup_9gram_frac") <= 0.11 &&
            col("dup_10gram_frac") <= 0.10)
    },
    Some("""WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
      b AS (SELECT doc_id, toks, len(toks) AS n_toks,
          CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT)
            AS total_chars
        FROM t),
      g AS (SELECT doc_id, total_chars, ns.n AS n,
          unnest(list_transform(generate_series(1, greatest(n_toks - ns.n + 1, 1)),
            i -> array_to_string(toks[i:i+ns.n-1], ' '))) AS gram
        FROM b, (SELECT unnest(generate_series(2, 10)) AS n) ns
        WHERE n_toks >= ns.n),
      c AS (SELECT doc_id, total_chars, n, gram,
          length(gram) - (n - 1) AS gram_len, COUNT(*) AS c
        FROM g GROUP BY doc_id, total_chars, n, gram),
      p AS (SELECT doc_id, total_chars, n,
          MAX(c * gram_len) AS top_chars,
          SUM(CASE WHEN c >= 2 THEN c * gram_len END) AS dup_chars
        FROM c GROUP BY doc_id, total_chars, n),
      w AS (SELECT doc_id, total_chars,
          MAX(CASE WHEN n = 2 THEN top_chars END) AS t2,
          MAX(CASE WHEN n = 3 THEN top_chars END) AS t3,
          MAX(CASE WHEN n = 4 THEN top_chars END) AS t4,
          MAX(CASE WHEN n = 5 THEN dup_chars END) AS d5,
          MAX(CASE WHEN n = 6 THEN dup_chars END) AS d6,
          MAX(CASE WHEN n = 7 THEN dup_chars END) AS d7,
          MAX(CASE WHEN n = 8 THEN dup_chars END) AS d8,
          MAX(CASE WHEN n = 9 THEN dup_chars END) AS d9,
          MAX(CASE WHEN n = 10 THEN dup_chars END) AS d10
        FROM p GROUP BY doc_id, total_chars)
      SELECT doc_id,
        CAST(coalesce(t2, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS top_2gram_frac,
        CAST(coalesce(t3, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS top_3gram_frac,
        CAST(coalesce(t4, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS top_4gram_frac,
        CAST(coalesce(d5, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_5gram_frac,
        CAST(coalesce(d6, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_6gram_frac,
        CAST(coalesce(d7, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_7gram_frac,
        CAST(coalesce(d8, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_8gram_frac,
        CAST(coalesce(d9, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_9gram_frac,
        CAST(coalesce(d10, 0) * 1000000 // greatest(total_chars, 1) AS DOUBLE) / 1000000.0 AS dup_10gram_frac,
        top_2gram_frac <= 0.20 AND top_3gram_frac <= 0.18 AND top_4gram_frac <= 0.16
          AND dup_5gram_frac <= 0.15 AND dup_6gram_frac <= 0.14
          AND dup_7gram_frac <= 0.13 AND dup_8gram_frac <= 0.12
          AND dup_9gram_frac <= 0.11 AND dup_10gram_frac <= 0.10 AS passes
      FROM w"""))

  /** Unicode script detection — the pre-langid gate every multilingual
    * corpus pipeline runs (stopword lang-id like [[langIdHeuristic]]
    * only works AFTER the script is known to be Latin; the majority of
    * web text is not). Counts code points in eight major script blocks
    * via one regexp_replace-removal per block (pure map-side scan work,
    * no explode), picks the dominant script with a fixed preference
    * order on ties, and emits the dominant fraction at 6dp integer
    * arithmetic. Block ranges are BMP code-point classes written as
    * `\x{….}` so Java regex and DuckDB RE2 parse them identically.
    * The synthetic corpus is ASCII, so planted Cyrillic/CJK/Arabic/
    * Greek/mixed/no-letter rows are unioned in on BOTH engines — the
    * oracle exercises real non-Latin classification, not just the
    * Latin fast path.
    */
  val scriptDetect: QueryDef = {
    val blocks: Seq[(String, String)] = Seq(
      "latin" -> """[A-Za-z]""",
      "cyrillic" -> """[\x{0400}-\x{04FF}]""",
      "greek" -> """[\x{0370}-\x{03FF}]""",
      "arabic" -> """[\x{0600}-\x{06FF}]""",
      "hebrew" -> """[\x{0590}-\x{05FF}]""",
      "cjk" -> """[\x{4E00}-\x{9FFF}]""",
      "hangul" -> """[\x{AC00}-\x{D7AF}]""",
      "devanagari" -> """[\x{0900}-\x{097F}]""")
    val names = blocks.map(_._1)
    // planted fixtures (id, text) — ids far above any synthetic doc_id
    val planted: Seq[(Long, String)] = Seq(
      9000001L -> "привет мир как дела сегодня",
      9000002L -> "你好世界这是一段测试文本",
      9000003L -> "مرحبا بالعالم هذا نص تجريبي",
      9000004L -> "γεια σου κοσμε δοκιμη",
      9000005L -> "abcde фывап",         // exact 5–5 tie → preference order
      9000006L -> "12345 !!! ??? 67890") // no letters → unknown
    QueryDef(
      "text_script_detect",
      (s, dir) => {
        import s.implicits._
        val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
          .unionByName(planted.toDF("doc_id", "text"))
        val counted = docs.select(col("doc_id") +: blocks.map { case (nm, re) =>
          (length(col("text")) -
            length(regexp_replace(col("text"), re, ""))).as(s"${nm}_n")
        }: _*)
        val total = names.map(n => col(s"${n}_n")).reduce(_ + _)
        // fixed preference order on ties: earlier block wins
        val dominant = names.zipWithIndex.foldRight(lit("unknown")) {
          case ((nm, i), rest) =>
            val geRest = names.drop(i + 1)
              .map(o => col(s"${nm}_n") >= col(s"${o}_n"))
              .foldLeft(lit(true))(_ && _)
            when(geRest, lit(nm)).otherwise(rest)
        }
        val domN = names.map(n => col(s"${n}_n")).reduce(greatest(_, _))
        counted
          .withColumn("total_letters", total)
          .withColumn("script", when(col("total_letters") === 0, lit("unknown"))
            .otherwise(dominant))
          .withColumn("n_script_chars",
            when(col("total_letters") === 0, lit(0)).otherwise(domN))
          .withColumn("script_frac", expr(
            // widen before ×1e6: a 100k-char doc would overflow int32
            // (ANSI mode makes that a runtime error, not a wrap)
            "CAST(CAST(n_script_chars AS BIGINT) * 1000000 DIV greatest(total_letters, 1) AS DOUBLE) / 1000000.0"))
          .select(col("doc_id"), col("script"), col("n_script_chars"),
            col("total_letters"), col("script_frac"))
      },
      Some {
        val cnts = blocks.map { case (nm, re) =>
          s"length(text) - length(regexp_replace(text, '$re', '', 'g')) AS ${nm}_n"
        }.mkString(",\n          ")
        val total = names.map(n => s"${n}_n").mkString(" + ")
        val caseChain = names.zipWithIndex.map { case (nm, i) =>
          val ge = names.drop(i + 1).map(o => s"${nm}_n >= ${o}_n")
          if (ge.isEmpty) s"ELSE '$nm'"
          else s"WHEN ${ge.mkString(" AND ")} THEN '$nm'"
        }.mkString("\n          ")
        val domN = s"greatest(${names.map(n => s"${n}_n").mkString(", ")})"
        val plantedSql = planted
          .map { case (id, t) => s"($id, '$t')" }.mkString(",\n          ")
        s"""WITH docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT * FROM (VALUES
          $plantedSql) v(doc_id, text)),
        c AS (SELECT doc_id,
          $cnts
        FROM docs),
        t AS (SELECT *, CAST($total AS BIGINT) AS total_letters,
          CAST($domN AS BIGINT) AS dom_n,
          CASE
          $caseChain
          END AS dom
        FROM c)
        SELECT doc_id,
          CASE WHEN total_letters = 0 THEN 'unknown' ELSE dom END AS script,
          CAST(CASE WHEN total_letters = 0 THEN 0 ELSE dom_n END AS INT) AS n_script_chars,
          CAST(total_letters AS INT) AS total_letters,
          CAST((CASE WHEN total_letters = 0 THEN 0 ELSE dom_n END) * 1000000
            // greatest(total_letters, 1) AS DOUBLE) / 1000000.0 AS script_frac
        FROM t"""
      })
  }

  /** Corpus "data card" — the per-(lang, source) statistics sheet a
    * training-data release ships with: doc/char/token totals, exact
    * duplicate ratio, and length percentiles. One doc-metadata pass:
    * the heavy columns (token count, content hash) are computed in the
    * scan stage; everything after shuffles only (lang, source, n_chars,
    * n_tok, sig) — metadata-sized at any corpus scale.
    *
    * Percentiles are DISCRETE (value at row ceil(q·n) of the sorted
    * group) computed via row_number + integer index arithmetic —
    * engine-stable where interpolating percentile functions are not:
    * Spark's `percentile` and DuckDB's `quantile_cont` both interpolate
    * in binary floating point and can disagree by an ulp. The ranking
    * window shuffles only the 4-column metadata projection. Ratios are
    * fixed to 6dp by integer arithmetic (see vocabStats).
    */
  def corpusDatacard(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("lang"), col("source"), col("n_chars"),
      size(tokens(col("text"))).as("n_tok"),
      md5(col("text").cast("binary")).as("sig"))
    val agg = perDoc.groupBy(col("lang"), col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"),
      sum(col("n_tok")).as("total_tokens"),
      countDistinct(col("sig")).as("n_unique"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"))
    val w = Window.partitionBy(col("lang"), col("source"))
    val ranked = perDoc
      .withColumn("rn", row_number().over(w.orderBy(col("n_chars"))))
      .withColumn("cnt", count(lit(1)).over(w))
    val quants = ranked.groupBy(col("lang"), col("source")).agg(
      max(when(col("rn") === expr("(cnt + 1) div 2"), col("n_chars"))).as("p50_chars"),
      max(when(col("rn") === expr("(9 * cnt + 9) div 10"), col("n_chars"))).as("p90_chars"))
    agg.join(quants, Seq("lang", "source"))
      .withColumn("dup_ratio",
        expr("CAST((n_docs - n_unique) * 1000000 DIV n_docs AS DOUBLE) / 1000000.0"))
      .orderBy(col("lang"), col("source"))
  }

  val datacard: QueryDef = QueryDef(
    "corpus_datacard",
    (s, dir) => corpusDatacard(Tables(s, dir, "documents")),
    Some("""WITH per_doc AS (
        SELECT lang, source, n_chars,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok,
               md5(text) AS sig
        FROM documents),
      agg AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               COUNT(DISTINCT sig) AS n_unique,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM per_doc GROUP BY lang, source),
      ranked AS (
        SELECT lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source ORDER BY n_chars) AS rn,
               COUNT(*) OVER (PARTITION BY lang, source) AS cnt
        FROM per_doc),
      q AS (
        SELECT lang, source,
               MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS p50_chars,
               MAX(CASE WHEN rn = (9 * cnt + 9) // 10 THEN n_chars END) AS p90_chars
        FROM ranked GROUP BY lang, source)
      SELECT agg.lang, agg.source, n_docs, total_chars, total_tokens, n_unique,
             min_chars, max_chars, p50_chars, p90_chars,
             CAST((n_docs - n_unique) * 1000000 // n_docs AS DOUBLE) / 1000000.0 AS dup_ratio
      FROM agg JOIN q ON agg.lang = q.lang AND agg.source = q.source
      ORDER BY agg.lang, agg.source"""))

  /** C4 cleaning rules (Raffel et al. 2020 §2.2 — the other canonical
    * web-corpus filter set next to Gopher): per LINE, keep only lines
    * ending in a terminal punctuation mark, with ≥ 3 words, not
    * mentioning "javascript"; per PAGE, drop any page containing
    * "lorem ipsum" or a curly brace, or with fewer than 5 sentences
    * after line filtering (sentence count approximated as terminal
    * punctuation marks in the retained text, documented deviation from
    * the paper's sentence splitter).
    *
    * Pure map-side column work — split / higher-order filter /
    * array_join are all native expressions, so at corpus scale this
    * runs in the scan stage like piiScrub. The synthetic corpus has no
    * newlines or punctuation (every doc fails the line filter — the
    * oracle still checks the whole transformation end to end);
    * C4FilterSpec drives realistic multi-line fixtures through every
    * rule. Output carries md5 of the cleaned text, not the text itself,
    * to keep the result table metadata-sized.
    */
  val c4Filter: QueryDef = QueryDef(
    "text_c4_filter",
    (s, dir) => {
      val lines = split(col("text"), "\n")
      val keptLines = filter(lines, l =>
        trim(l).rlike("[.!?\"']$") &&
          size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 3 &&
          !contains(lower(l), lit("javascript")))
      Tables(s, dir, "documents")
        .withColumn("clean_text", array_join(keptLines, "\n"))
        .withColumn("n_sentences",
          size(regexp_extract_all(col("clean_text"), lit("[.!?]"), lit(0))))
        .select(col("doc_id"),
          size(lines).as("n_lines"),
          size(keptLines).as("n_kept"),
          col("n_sentences"),
          (!contains(lower(col("text")), lit("lorem ipsum")) &&
            !contains(col("text"), lit("{")) &&
            col("n_sentences") >= 5).as("keep"),
          md5(col("clean_text").cast("binary")).as("clean_sig"))
    },
    Some("""WITH c AS (
        SELECT doc_id, text,
          string_split(text, chr(10)) AS lines,
          list_filter(string_split(text, chr(10)), l ->
            regexp_matches(trim(l), '[.!?"'']$')
            AND len(regexp_extract_all(l, '\S+')) >= 3
            AND NOT contains(lower(l), 'javascript')) AS kept
        FROM documents),
      t AS (
        SELECT doc_id, text, lines, kept,
          -- DuckDB's array_to_string([]) is NULL, Spark's array_join is ''
          coalesce(array_to_string(kept, chr(10)), '') AS clean_text
        FROM c)
      SELECT doc_id,
        CAST(len(lines) AS INT) AS n_lines,
        CAST(len(kept) AS INT) AS n_kept,
        CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS INT) AS n_sentences,
        (NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{')
          AND len(regexp_extract_all(clean_text, '[.!?]')) >= 5) AS keep,
        md5(clean_text) AS clean_sig
      FROM t"""))

  /** Passage chunking — the retrieval/embedding-training prep step:
    * each document becomes overlapping token windows (50 tokens,
    * stride 40). Pure map-side explode: sequence() generates the
    * window starts, slice() cuts each window from the ONE tokenize
    * pass — no shuffle at all, so at corpus scale this runs at scan
    * speed and the output is written partition-local. Output carries
    * the chunk signature, not the text, keeping the result
    * metadata-sized (the real pipeline would write chunk text to the
    * training sink; Verify hashes the signature).
    */
  def chunkDocs(docs: DataFrame, chunk: Int = 50, stride: Int = 40): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        slice(col("toks"), col("start") + 1, lit(chunk)).as("c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("c")).as("n_tokens"),
        md5(array_join(col("c"), " ").cast("binary")).as("chunk_sig"))

  val chunkPassages: QueryDef = QueryDef(
    "chunk_passages",
    (s, dir) => chunkDocs(Tables(s, dir, "documents")),
    Some("""WITH tk AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
      st AS (
        SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start
        FROM tk WHERE len(toks) >= 1),
      ch AS (
        SELECT doc_id, CAST(start // 40 AS INT) AS chunk_idx,
               list_slice(toks, start + 1, start + 50) AS c
        FROM st)
      SELECT doc_id, chunk_idx, CAST(len(c) AS INT) AS n_tokens,
             md5(array_to_string(c, ' ')) AS chunk_sig
      FROM ch"""))

  /** Per-document keyword extraction by TF·IDF — the standard doc-tagging
    * pass of a curation pipeline (and the scoring half of text_bm25,
    * exposed per-document instead of per-query). The plan splits the
    * work by cardinality: document frequency aggregates over the WHOLE
    * corpus (vocab-sized output, partial+final hash agg on the token
    * shuffle), while term frequency is computed only for the tagged doc
    * slice — the doc_id filter pushes to the scan, so at 100 TB the
    * per-doc side costs O(tagged docs), never O(corpus). N arrives as a
    * broadcast 1-row cross join, not a driver-side collect.
    */
  val keywordsTfidf: QueryDef = QueryDef(
    "text_keywords_tfidf",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val allToks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      val df = allToks.groupBy(col("word")).agg(countDistinct(col("doc_id")).as("df"))
      val tf = allToks.filter(col("doc_id") < 20)
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "word").crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs").cast(DoubleType) / col("df")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), round(col("score"), 6).as("score"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents),
      df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
      tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks WHERE doc_id < 20
             GROUP BY doc_id, word),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.word, tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df) AS score
        FROM tf JOIN df USING (word) CROSS JOIN n)
      SELECT doc_id, rank, word, ROUND(score, 6) AS score FROM (
        SELECT doc_id, word, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rank
        FROM scored) WHERE rank <= 3"""))

  val all: Seq[QueryDef] = Seq(
    p6WordCount, dedupExact, fpUniqueness, tokenCounts, tokenCountsBpe,
    tokenCountsBpeExact, textQuality, qualityGopher, langIdHeuristic, piiScrub,
    textNormalize, bm25, readability, textEntropy, fpWinnowing, vocabStatsQuery,
    textRepetition, scriptDetect, datacard, c4Filter, chunkPassages,
    keywordsTfidf)
}
