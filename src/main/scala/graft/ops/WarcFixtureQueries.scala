package graft.ops

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Oracle-graded fixtures for the WARC-side extractors that previously
  * had only ScalaTest/CLI coverage (VERDICT r6 §5): each query
  * synthesizes a deterministic HTML / robots.txt corpus FROM the
  * `documents` table, drives the REAL extraction code (mainContent,
  * anchorTextsHtml, robotsRulesText + robotsAllowed), and aggregates to
  * a small table whose expected content the DuckDB oracle derives
  * INDEPENDENTLY by arithmetic on the same rows — so a boilerplate-
  * removal, anchor-resolution, or RFC 9309 evaluation regression flips
  * a graded row red instead of hiding behind a fixture assert.
  *
  * Scale shape: all three are pure map stages over the corpus scan
  * followed by one keyed aggregation — the same shape as the text
  * analysis queries; nothing quadratic, nothing collected.
  */
object WarcFixtureQueries {

  /** Boilerplate removal: page = nav + article(text) + footer. The main
    * content of the synthesized page is exactly the document text (one
    * block, zero link density), so extraction must return it verbatim
    * when it clears the 10-word floor and drop it otherwise.
    */
  val warcMainContent: QueryDef = QueryDef(
    "warc_main_content",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("text"))
        .as[(String, Long, String)]
        .map { case (source, id, text) =>
          val html =
            s"""<html><head><title>doc $id</title><script>var x = 1;</script></head><body>
               |<nav><a href="/">home</a> <a href="/about">about menu</a></nav>
               |<div><p>$text</p></div>
               |<footer>copyright 2026 example site footer</footer>
               |</body></html>""".stripMargin
          val main = HtmlText.mainContent(html)
          val expected = text.replaceAll("[\\s\\u00a0]+", " ").trim
          (source,
            if (main.nonEmpty) 1L else 0L,
            if (main.nonEmpty && main == expected) 1L else 0L,
            main.length.toLong)
        }
        .toDF("source", "extracted", "exact", "n_chars")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("extracted")).as("n_main"),
          sum(col("exact")).as("n_exact"),
          sum(col("n_chars")).as("main_chars"))
    },
    Some("""WITH w AS (
        SELECT source, regexp_replace(trim(text), '\s+', ' ', 'g') AS t
        FROM documents),
      q AS (SELECT source, t,
          CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS words
        FROM w)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN words >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_main,
        CAST(SUM(CASE WHEN words >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        CAST(SUM(CASE WHEN words >= 10 THEN len(t) ELSE 0 END) AS BIGINT) AS main_chars
      FROM q GROUP BY source"""))

  /** Anchor-text corpus: each page carries one relative and one absolute
    * anchor (plus fragment/mailto/empty decoys that must be dropped);
    * the oracle reconstructs the resolved (target, text) pairs by string
    * arithmetic, so both the regex extraction and the base-URL
    * resolution are under the hash gate.
    */
  val warcAnchorText: QueryDef = QueryDef(
    "warc_anchor_text",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("lang"))
        .as[(String, Long, String)]
        .flatMap { case (source, id, lang) =>
          val url = s"http://$source.test/page$id"
          val html =
            s"""<html><body>
               |<p><a href="/topic${id % 10}">topic ${id % 10} overview</a></p>
               |<p><a href="http://partner.example/p${id % 7}">partner $lang link</a></p>
               |<a href="#skip">fragment decoy</a>
               |<a href="mailto:a@b.c">mail decoy</a>
               |<a href="/empty">   </a>
               |</body></html>""".stripMargin
          Extractors.anchorTextsHtml(url, html)
        }
        .toDF("target", "text")
        .groupBy(col("target"))
        .agg(count(lit(1)).as("n_anchors"),
          countDistinct(col("text")).as("n_texts"))
    },
    Some("""WITH a AS (
        SELECT 'http://' || source || '.test/topic' || CAST(doc_id % 10 AS VARCHAR) AS target,
               'topic ' || CAST(doc_id % 10 AS VARCHAR) || ' overview' AS text
        FROM documents
        UNION ALL
        SELECT 'http://partner.example/p' || CAST(doc_id % 7 AS VARCHAR),
               'partner ' || lang || ' link'
        FROM documents)
      SELECT target, COUNT(*) AS n_anchors,
        CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts
      FROM a GROUP BY target"""))

  /** RFC 9309 evaluation: every doc's robots.txt has a `*` group
    * (prefix disallow, $-anchored allow override, `*`-wildcard
    * disallow) and a graftbot group whose disallowed path varies with
    * doc_id % 3. The oracle states the expected verdicts directly, so
    * group selection, longest-match, allow-on-tie, wildcards and the
    * end anchor are all hash-checked.
    */
  val warcRobotsEval: QueryDef = QueryDef(
    "warc_robots_eval",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val k = id % 3
          val robots = "User-agent: *\nDisallow: /private\nAllow: /private/ok$\n" +
            s"Disallow: /t*p\nUser-agent: graftbot\nDisallow: /g$k\n"
          val rules = Extractors.robotsRulesText("h.test", robots).toVector
          def ok(agent: String, path: String): Long =
            if (Extractors.robotsAllowed(rules, agent, path)) 1L else 0L
          (k, ok("graftbot", "/g0"), ok("graftbot", "/g1"),
            ok("graftbot", "/private/x"), ok("otherbot", "/private/x"),
            ok("otherbot", "/private/ok"), ok("otherbot", "/top"),
            ok("otherbot", "/public"))
        }
        .toDF("grp", "g0", "g1", "bot_priv", "star_priv",
          "star_privok", "star_top", "star_public")
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("g0")).as("bot_g0_allowed"),
          sum(col("g1")).as("bot_g1_allowed"),
          sum(col("bot_priv")).as("bot_priv_allowed"),
          sum(col("star_priv")).as("star_priv_allowed"),
          sum(col("star_privok")).as("star_privok_allowed"),
          sum(col("star_top")).as("star_top_allowed"),
          sum(col("star_public")).as("star_public_allowed"))
    },
    Some("""WITH g AS (SELECT doc_id % 3 AS grp FROM documents)
      SELECT grp, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN grp != 0 THEN 1 ELSE 0 END) AS BIGINT) AS bot_g0_allowed,
        CAST(SUM(CASE WHEN grp != 1 THEN 1 ELSE 0 END) AS BIGINT) AS bot_g1_allowed,
        COUNT(*) AS bot_priv_allowed,
        CAST(0 AS BIGINT) AS star_priv_allowed,
        COUNT(*) AS star_privok_allowed,
        CAST(0 AS BIGINT) AS star_top_allowed,
        COUNT(*) AS star_public_allowed
      FROM g GROUP BY grp"""))

  val all: Seq[QueryDef] = Seq(warcMainContent, warcAnchorText, warcRobotsEval)
}
