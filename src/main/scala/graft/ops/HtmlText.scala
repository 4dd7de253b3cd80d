package graft.ops

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Hand-written HTML → plain-text extraction (reference bs4_parser.py:10-41 /
  * resiliparse_parser.py:11-36, P7 in SURVEY §2.2): strip script/style/
  * comments, drop tags, decode entities, normalize whitespace.
  *
  * Charset chain (bs4 EncodingDetector analogue, SURVEY §7.4): declared
  * charset (HTTP header / coordinate column) → BOM → <meta charset> sniff
  * → UTF-8 with replacement.
  */
object HtmlText {

  private val SkipTags = Set("script", "style")

  /** Decode payload bytes using the charset chain. */
  def decode(bytes: Array[Byte], declaredCharset: Option[String]): String = {
    val cs = declaredCharset.flatMap(tryCharset)
      .orElse(bomCharset(bytes))
      .orElse(sniffMetaCharset(bytes).flatMap(tryCharset))
      .getOrElse(StandardCharsets.UTF_8)
    lenientDecode(bytes, cs)
  }

  private def tryCharset(name: String): Option[Charset] =
    try Some(Charset.forName(name.trim)) catch { case _: Exception => None }

  private def bomCharset(b: Array[Byte]): Option[Charset] = {
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte && b(2) == 0xBF.toByte)
      Some(StandardCharsets.UTF_8)
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some(StandardCharsets.UTF_16LE)
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some(StandardCharsets.UTF_16BE)
    else None
  }

  private val MetaCharset =
    """(?is)<meta[^>]+charset\s*=\s*["']?([\w\-]+)""".r

  /** Sniff `<meta charset=...>` in the first 1024 bytes (ASCII superset). */
  def sniffMetaCharset(bytes: Array[Byte]): Option[String] = {
    val head = new String(bytes, 0, math.min(1024, bytes.length), StandardCharsets.ISO_8859_1)
    MetaCharset.findFirstMatchIn(head).map(_.group(1))
  }

  def lenientDecode(bytes: Array[Byte], cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
  }

  /** Strict UTF-8 decode; None on any malformed byte
    * (sitemaps_from_robotstxt.py:76-80 skip-and-count semantics).
    */
  def strictUtf8(bytes: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  /** Extract visible text from HTML: single-pass tag scanner. Script/style
    * bodies are skipped by searching for the literal closing tag — raw `<`
    * inside them (e.g. `if (x<y)`) must not be parsed as markup.
    */
  def extractText(html: String): String = {
    val sb = new java.lang.StringBuilder(html.length / 4)
    val lower = html.toLowerCase
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          sb.append(' ')
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end).trim
            val isClose = inner.startsWith("/")
            val name = inner.dropWhile(_ == '/').takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (!isClose && SkipTags.contains(name) && !inner.endsWith("/")) {
              val close = lower.indexOf("</" + name, end + 1)
              if (close < 0) i = n
              else {
                val closeEnd = html.indexOf('>', close)
                i = if (closeEnd < 0) n else closeEnd + 1
              }
            } else i = end + 1
            sb.append(' ') // tags imply whitespace breaks
          }
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    normalizeWs(Entities.decode(sb.toString))
  }

  private def normalizeWs(s: String): String =
    s.replaceAll("[\\s\\u00a0]+", " ").trim

  private val BlockTags = Set(
    "p", "div", "td", "th", "li", "dd", "dt", "h1", "h2", "h3", "h4", "h5",
    "h6", "br", "tr", "table", "ul", "ol", "blockquote", "article", "section",
    "main", "body", "form", "pre", "figcaption", "summary", "details")

  /** Containers that are boilerplate by role; Readability's
    * "unlikely candidates".
    */
  private val DropContainers = Set("nav", "footer", "header", "aside")

  /** Main-content extraction (boilerplate removal) — the jusText /
    * Boilerpipe recipe (Pomikálek 2011; Kohlschütter et al. 2010)
    * distilled to its two load-bearing signals, dependency-free and
    * deterministic:
    *
    *   1. segment at block-level tags (the scanner flushes a block at
    *      every BlockTags boundary);
    *   2. keep a block iff it has ≥ `minWords` words AND its link
    *      density (chars inside <a> ÷ block chars) ≤ `maxLinkDensity`;
    *      blocks anywhere inside nav/footer/header/aside are dropped
    *      outright.
    *
    * Navigation bars and link farms fail the density rule, copyright
    * lines and button labels fail the word floor, and role-tagged
    * chrome never reaches scoring. Same single-pass scanner as
    * extractText (script/style bodies skipped via literal closing-tag
    * search); an unclosed drop-container swallows the remainder of the
    * document — the precision-over-recall trade the published
    * heuristics make. Kept blocks join with '\n' so downstream
    * line-oriented quality rules (Gopher dup-line, bullet ratios) see
    * real block structure.
    */
  def mainContent(html: String, minWords: Int = 10,
                  maxLinkDensity: Double = 0.33): String = {
    val lower = html.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[String]
    val sb = new java.lang.StringBuilder(256)
    var anchorChars = 0
    var anchorDepth = 0
    var dropDepth = 0
    def flush(): Unit = {
      if (sb.length > 0) {
        val raw = sb.toString
        val text = normalizeWs(Entities.decode(raw))
        if (text.nonEmpty && dropDepth == 0) {
          val words = text.split(' ').length
          val ld = anchorChars.toDouble / math.max(raw.trim.length, 1)
          if (words >= minWords && ld <= maxLinkDensity) out += text
        }
        sb.setLength(0)
      }
      anchorChars = 0
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          sb.append(' ')
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          if (end < 0) { i = n }
          else {
            val inner = html.substring(i + 1, end).trim
            val isClose = inner.startsWith("/")
            val name = inner.dropWhile(_ == '/')
              .takeWhile(ch => ch.isLetterOrDigit).toLowerCase
            if (!isClose && SkipTags.contains(name) && !inner.endsWith("/")) {
              val close = lower.indexOf("</" + name, end + 1)
              if (close < 0) i = n
              else {
                val closeEnd = html.indexOf('>', close)
                i = if (closeEnd < 0) n else closeEnd + 1
              }
            } else {
              if (DropContainers.contains(name)) {
                flush()
                if (isClose) dropDepth = math.max(0, dropDepth - 1)
                else if (!inner.endsWith("/")) dropDepth += 1
              } else if (name == "a") {
                if (isClose) anchorDepth = math.max(0, anchorDepth - 1)
                else if (!inner.endsWith("/")) anchorDepth += 1
              } else if (BlockTags.contains(name)) {
                flush()
              }
              i = end + 1
            }
            sb.append(' ')
          }
        }
      } else {
        sb.append(c)
        if (anchorDepth > 0 && !Character.isWhitespace(c)) anchorChars += 1
        i += 1
      }
    }
    flush()
    out.mkString("\n")
  }
}

/** HTML entity decoding: named core set + numeric references. */
object Entities {
  private val named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "eacute" -> "é", "egrave" -> "è",
    "agrave" -> "à", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "szlig" -> "ß", "ntilde" -> "ñ")

  private val EntityRe = """&(#x?[0-9a-fA-F]+|\w+);""".r

  def decode(s: String): String =
    if (s.indexOf('&') < 0) s
    else EntityRe.replaceAllIn(s, m => {
      val e = m.group(1)
      val rep =
        if (e.startsWith("#x") || e.startsWith("#X"))
          try new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
          catch { case _: Exception => m.matched }
        else if (e.startsWith("#"))
          try new String(Character.toChars(e.drop(1).toInt))
          catch { case _: Exception => m.matched }
        else named.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(rep)
    })
}
