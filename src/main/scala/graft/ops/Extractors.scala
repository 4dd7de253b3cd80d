package graft.ops

import graft.warc.{Predicates, WarcRecord}

import scala.util.matching.Regex

/** Per-record extraction functions — the `process_record` family
  * (SURVEY §2.2 P3–P6, P9, P13). Each is a pure
  * `WarcRecord => Iterator[...]` used from `Dataset.flatMap`.
  */
object Extractors {

  // ---- P3: HTML tag histogram (html_tag_count.py:14-26) ----

  private val TagRe: Regex = """<([a-zA-Z0-9]+)""".r

  /** Per-document tag counts (per-doc pre-aggregation, A4). */
  def htmlTagCounts(r: WarcRecord): Iterator[(String, Long)] = {
    if (!Predicates.isResponse(r) || !Predicates.isHtml(r)) return Iterator.empty
    val body = new String(r.contentBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    TagRe.findAllMatchIn(body).foreach { m =>
      val t = m.group(1).toLowerCase
      counts.update(t, counts.getOrElse(t, 0L) + 1L)
    }
    counts.iterator
  }

  // ---- P4: Server header extraction (server_count.py:12-75) ----

  val NoServer = "(no server in HTTP header)"

  /** Distinct Server header values per response, fallback key when absent. */
  def serverNames(r: WarcRecord): Iterator[(String, Long)] = {
    if (!Predicates.isResponse(r)) return Iterator.empty
    r.http match {
      case Some(h) =>
        val servers = h.headerValues("Server").map(_.trim).filter(_.nonEmpty).distinct
        if (servers.isEmpty) Iterator.single((NoServer, 1L))
        else servers.iterator.map(s => (s, 1L))
      case None => Iterator.single((NoServer, 1L))
    }
  }

  /** WAT path of P4 (server_count.py:23-47): Server header(s) from the
    * WAT JSON envelope; list- or scalar-valued.
    */
  def serverNamesWat(r: WarcRecord): Iterator[(String, Long)] = {
    if (!Predicates.isWatJson(r)) return Iterator.empty
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(r.payload)
      catch { case _: Exception => return Iterator.empty }
    val env = root.path("Envelope")
    if (env.path("WARC-Header-Metadata").path("WARC-Type").asText("") != "response")
      return Iterator.empty
    val server = env.path("Payload-Metadata")
      .path("HTTP-Response-Metadata").path("Headers").path("Server")
    val values =
      if (server.isArray) {
        val b = Vector.newBuilder[String]
        server.forEach(v => b += v.asText(""))
        b.result()
      } else if (!server.isMissingNode && !server.isNull) Vector(server.asText(""))
      else Vector.empty
    val distinct = values.map(_.trim).filter(_.nonEmpty).distinct
    if (distinct.isEmpty) Iterator.single((NoServer, 1L))
    else distinct.iterator.map(s => (s, 1L))
  }

  // ---- P5: host/IP pairs (server_ip_address.py:26-64) ----

  def hostIpPairs(r: WarcRecord): Iterator[((String, String), Long)] = {
    if (!Predicates.isResponse(r)) return Iterator.empty
    val ip = r.ipAddress.getOrElse("(no IP address)")
    val host = r.targetUri.flatMap(SurtHost.hostOf).getOrElse("(no host)")
    Iterator.single(((host, ip), 1L))
  }

  // ---- P6: tokenization + per-doc TF (word_count.py:25-39) ----

  private val WordRe: Regex = """[\p{L}\p{N}_]+""".r

  /** (word, (tf, df=1)) with per-doc combine, from WET text records. */
  def wordCounts(r: WarcRecord): Iterator[(String, (Long, Long))] = {
    if (!Predicates.isWetText(r)) return Iterator.empty
    val text = HtmlText.lenientDecode(r.payload, java.nio.charset.StandardCharsets.UTF_8)
    tokenizeCounts(text)
  }

  def tokenizeCounts(text: String): Iterator[(String, (Long, Long))] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    WordRe.findAllIn(text.toLowerCase).foreach { w =>
      counts.update(w, counts.getOrElse(w, 0L) + 1L)
    }
    counts.iterator.map { case (w, tf) => (w, (tf, 1L)) }
  }

  // ---- P9: redirect targets (wat_extract_links.py:125-147) ----

  /** (from_url, to_url) for 30x responses with a Location header. */
  def redirectLinks(r: WarcRecord): Iterator[(String, String)] = {
    if (!Predicates.isRedirect(r)) return Iterator.empty
    (for {
      uri <- r.targetUri
      http <- r.http
      loc <- http.header("Location")
      resolved <- SurtHost.urlJoin(uri, loc)
    } yield (uri, resolved)).iterator
  }

  // ---- P13: robots.txt sitemap URLs (sitemaps_from_robotstxt.py:20-106) ----

  private val SitemapLine: Regex = """(?i)^\s*sitemap:\s*(\S+)\s*$""".r

  /** (sitemap_url, robots_host) from HTTP-200 robots.txt captures; strict
    * UTF-8 (undecodable bodies skipped), relative URLs resolved against
    * the robots URL. Returns per-record results plus a flag set for
    * accumulator-style counters.
    */
  def sitemapUrls(r: WarcRecord, maxPerFile: Int = 50): Iterator[(String, String)] = {
    if (!Predicates.isResponse(r)) return Iterator.empty
    if (!r.http.exists(_.statusCode == 200)) return Iterator.empty
    val robotsUrl = r.targetUri.getOrElse(return Iterator.empty)
    val body = r.http.map(_.body).getOrElse(return Iterator.empty)
    val text = HtmlText.strictUtf8(body).getOrElse(return Iterator.empty)
    lazy val host = SurtHost.hostOf(robotsUrl)
    val out = Vector.newBuilder[(String, String)]
    var n = 0
    text.linesIterator.foreach { line =>
      if (n < maxPerFile) SitemapLine.findFirstMatchIn(line).foreach { m =>
        val raw = m.group(1)
        val abs =
          if (raw.matches("^https?://.*")) Some(raw)
          else SurtHost.urlJoin(robotsUrl, raw)
        for (u <- abs; h <- host) { out += ((u, h)); n += 1 }
      }
    }
    out.result().iterator
  }

  // ---- P10: cross-host sitemap edges for the host graph
  //      (wat_extract_links.py:523-547) ----

  def sitemapHostEdges(r: WarcRecord): Iterator[(String, String)] = {
    sitemapUrls(r, Int.MaxValue).flatMap { case (sitemapUrl, robotsHost) =>
      for {
        sitemapHost <- SurtHost.hostOf(sitemapUrl)
        src <- SurtHost.reverseHost(robotsHost)
        dst <- SurtHost.reverseHost(sitemapHost)
        if src != dst
      } yield (src, dst)
    }
  }

  // ---- robots.txt rule extraction (extension beyond the reference's
  //      sitemap-only parsing): (host, agent, directive, path) ----

  private val AgentLine = """(?i)^\s*user-agent:\s*(\S+)\s*$""".r
  private val RuleLine = """(?i)^\s*(allow|disallow):\s*(\S*)\s*$""".r

  final case class RobotsRule(host: String, agent: String,
                              directive: String, path: String)

  /** Parse User-agent groups and their Allow/Disallow rules from HTTP-200
    * robots.txt captures — the crawl-policy signal a pipeline needs
    * alongside the reference's sitemap extraction.
    */
  def robotsRules(r: WarcRecord): Iterator[RobotsRule] = {
    if (!Predicates.isResponse(r)) return Iterator.empty
    if (!r.http.exists(_.statusCode == 200)) return Iterator.empty
    val host = r.targetUri.flatMap(SurtHost.hostOf).getOrElse(return Iterator.empty)
    val body = r.http.map(_.body).getOrElse(return Iterator.empty)
    val text = HtmlText.strictUtf8(body).getOrElse(return Iterator.empty)
    robotsRulesText(host, text)
  }

  /** Text-level parse (the WARC-record wrapper above handles transport);
    * exposed so fixture-graded queries can drive the same parser.
    */
  def robotsRulesText(host: String, text: String): Iterator[RobotsRule] = {
    val out = Vector.newBuilder[RobotsRule]
    var agents: List[String] = Nil
    var inGroup = false
    text.linesIterator.foreach {
      case AgentLine(a) =>
        // consecutive User-agent lines share one group
        agents = if (inGroup) List(a) else a :: agents
        inGroup = false
      case RuleLine(directive, path) =>
        inGroup = true
        agents.foreach(a =>
          out += RobotsRule(host, a.toLowerCase, directive.toLowerCase, path))
      case _ => ()
    }
    out.result().iterator
  }

  /** RFC 9309 rule evaluation over parsed robots rules — the decision
    * side of the crawl-policy signal (robotsRules is the parse side):
    * the crawler's group is the agent's own rules if any exist, else the
    * `*` group; within the group the LONGEST matching path pattern wins,
    * allow beating disallow on ties; no match (or an empty-path
    * Disallow) means allowed. Patterns support the REP `*` wildcard and
    * `$` end anchor; an unanchored pattern matches any path it prefixes.
    */
  def robotsAllowed(rules: Seq[RobotsRule], agent: String, path: String): Boolean = {
    val al = agent.toLowerCase
    val ad = rules.filter(r => r.directive == "allow" || r.directive == "disallow")
    val mine = ad.filter(_.agent == al)
    val eff = if (mine.nonEmpty) mine else ad.filter(_.agent == "*")
    val matching = eff.filter(r => r.path.nonEmpty && robotsPathMatches(r.path, path))
    if (matching.isEmpty) true
    else {
      val best = matching.maxBy(r => (r.path.length, r.directive == "allow"))
      best.directive == "allow"
    }
  }

  private def robotsPathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val rx = pat.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*") +
      (if (anchored) "" else ".*")
    path.matches(rx)
  }

  // ---- HTML link extraction from raw responses (href/src + <base>),
  //      so plain WARC inputs feed the host graph like WAT does ----

  private val BaseRe = """(?is)<base[^>]+href\s*=\s*["']?([^"'\s>]+)""".r
  private val LinkAttrRe = """(?is)<(?:a|link|img|script|iframe|area|form)\b[^>]*?\s(?:href|src|action)\s*=\s*["']?([^"'\s>]+)""".r

  /** Outgoing links of an HTML response: (src_url, resolved_target).
    * Guarantees the self-edge like the WAT path (wat_extract_links.py:
    * 253-255) so linkless pages stay in the graph.
    */
  def htmlLinks(r: WarcRecord): Iterator[(String, String)] = {
    if (!Predicates.isResponse(r) || !Predicates.isHtml(r)) return Iterator.empty
    val url = r.targetUri.getOrElse(return Iterator.empty)
    val html = HtmlText.decode(r.contentBytes,
      r.headers.get("WARC-Identified-Content-Charset"))
    val base = BaseRe.findFirstMatchIn(html).map(_.group(1))
      .flatMap(b => SurtHost.urlJoin(url, b)).getOrElse(url)
    val targets = LinkAttrRe.findAllMatchIn(html).flatMap { m =>
      val t = m.group(1).trim
      if (t.isEmpty || t.startsWith("#") || t.startsWith("javascript:") ||
        t.startsWith("mailto:") || t.startsWith("data:")) None
      else SurtHost.urlJoin(base, t)
    }.toVector
    ((targets :+ url).distinct).iterator.map(t => (url, t))
  }

  private val AnchorRe =
    """(?is)<a\b[^>]*?\shref\s*=\s*["']?([^"'\s>]+)[^>]*>(.*?)</a>""".r
  private val InnerTagRe = """(?s)<[^>]*>""".r

  /** Anchor-text pairs of an HTML response: (resolved_target, text) for
    * every `<a href>` with non-empty visible text — the anchor-text
    * corpus recipe (link text describes the TARGET page, so aggregated
    * per target it is a free query/description training signal; the
    * ORCAS-style complement to htmlLinks' pure edges). Inner markup is
    * stripped and entities decoded like the main text path; texts are
    * whitespace-normalized and capped at 200 chars (longer runs are
    * wrapped content, not anchor labels). Fragment/javascript/mailto/
    * data targets are dropped as in htmlLinks.
    */
  def anchorTexts(r: WarcRecord): Iterator[(String, String)] = {
    if (!Predicates.isResponse(r) || !Predicates.isHtml(r)) return Iterator.empty
    val url = r.targetUri.getOrElse(return Iterator.empty)
    val html = HtmlText.decode(r.contentBytes,
      r.headers.get("WARC-Identified-Content-Charset"))
    anchorTextsHtml(url, html)
  }

  /** HTML-level extraction (the WARC-record wrapper above handles
    * transport); exposed so fixture-graded queries can drive the same
    * extractor.
    */
  def anchorTextsHtml(url: String, html: String): Iterator[(String, String)] = {
    val base = BaseRe.findFirstMatchIn(html).map(_.group(1))
      .flatMap(b => SurtHost.urlJoin(url, b)).getOrElse(url)
    AnchorRe.findAllMatchIn(html).flatMap { m =>
      val href = m.group(1).trim
      val text = Entities.decode(InnerTagRe.replaceAllIn(m.group(2), " "))
        .replaceAll("[\\s\\u00a0]+", " ").trim
      if (href.isEmpty || href.startsWith("#") || href.startsWith("javascript:") ||
        href.startsWith("mailto:") || href.startsWith("data:") ||
        text.isEmpty || text.length > 200) None
      else SurtHost.urlJoin(base, href).map(t => (t, text))
    }
  }

  // ---- P7 composition: HTML response → plain text ----

  def htmlToText(r: WarcRecord, declaredCharset: Option[String] = None,
                 mainOnly: Boolean = false): Option[String] = {
    if (!Predicates.isResponse(r) || !Predicates.isHtml(r)) return None
    val cs = declaredCharset
      .orElse(r.headers.get("WARC-Identified-Content-Charset"))
      .orElse(r.http.flatMap(_.header("Content-Type"))
        .flatMap(ct => """charset=([\w\-]+)""".r.findFirstMatchIn(ct).map(_.group(1))))
    val html = HtmlText.decode(r.contentBytes, cs)
    Some(if (mainOnly) HtmlText.mainContent(html) else HtmlText.extractText(html))
  }
}
