package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.warc.{Predicates, WarcRecord}

/** WAT-payload link extraction (reference wat_extract_links.py:77-255, P8):
  * walk the WAT JSON envelope for HTTP Link/Content-Location headers and
  * HTML head/body link metadata, resolve against the page URL/base, and
  * emit (src, target) URL pairs. Jackson databind ships with Spark.
  */
object WatLinks {

  private val mapper = new ObjectMapper()

  // meta property/name whitelists (wat_extract_links.py:48-55)
  private val MetaProps = Set("og:url", "og:image", "og:audio", "og:video",
    "twitter:image", "twitter:image:src")
  private val MetaNames = Set("twitter:image", "twitter:image:src")

  private val UrlInAngle = """<([^>]+)>""".r

  /** All outgoing links of one WAT record: (src_url, target_url). Always
    * includes the self-edge (url, url) so linkless pages stay in the graph
    * (wat_extract_links.py:253-255).
    */
  def extractLinks(r: WarcRecord): Iterator[(String, String)] = {
    if (!Predicates.isWatJson(r)) return Iterator.empty
    val root =
      try mapper.readTree(r.payload)
      catch { case _: Exception => return Iterator.empty }
    val envelope = root.path("Envelope")
    val warcHeader = envelope.path("WARC-Header-Metadata")
    if (warcHeader.path("WARC-Type").asText("") != "response") return Iterator.empty
    val url = warcHeader.path("WARC-Target-URI").asText("")
    if (url.isEmpty) return Iterator.empty

    val payloadMeta = envelope.path("Payload-Metadata").path("HTTP-Response-Metadata")
    val out = Vector.newBuilder[(String, String)]

    // HTTP headers: Content-Location + Link (RFC 5988 <url> pattern)
    val headers = payloadMeta.path("Headers")
    if (headers.isObject) {
      forEachValue(headers.path("Content-Location")) { v =>
        resolve(url, v).foreach(t => out += ((url, t)))
      }
      forEachValue(headers.path("Link")) { v =>
        UrlInAngle.findAllMatchIn(v).foreach { m =>
          resolve(url, m.group(1)).foreach(t => out += ((url, t)))
        }
      }
    }

    val htmlMeta = payloadMeta.path("HTML-Metadata")
    val head = htmlMeta.path("Head")
    // <base href> changes the resolution base for body links
    val base = Option(head.path("Base").asText(null))
      .flatMap(b => SurtHost.urlJoin(url, b)).getOrElse(url)

    // Head.Link rel targets
    head.path("Link").forEach { l =>
      val target = firstText(l, "url", "href")
      target.flatMap(t => resolve(base, t)).foreach(t => out += ((url, t)))
    }
    // Head.Metas with whitelisted property/name
    head.path("Metas").forEach { m =>
      val prop = m.path("property").asText("")
      val name = m.path("name").asText("")
      if (MetaProps.contains(prop) || MetaNames.contains(name)) {
        Option(m.path("content").asText(null))
          .flatMap(c => resolve(base, c)).foreach(t => out += ((url, t)))
      }
    }
    // Head.Scripts src
    head.path("Scripts").forEach { s =>
      firstText(s, "url", "src").flatMap(t => resolve(base, t))
        .foreach(t => out += ((url, t)))
    }
    // body Links
    htmlMeta.path("Links").forEach { l =>
      firstText(l, "url", "href").flatMap(t => resolve(base, t))
        .foreach(t => out += ((url, t)))
    }

    val links = out.result()
    // guarantee the self-edge so the page's host appears as a vertex
    (links :+ ((url, url))).distinct.iterator
  }

  /** Host-level SURT edges from WAT link pairs (the ExtractHostLinksJob
    * projection, wat_extract_links.py:332-335).
    */
  def hostEdges(r: WarcRecord): Iterator[(String, String)] =
    extractLinks(r).flatMap { case (s, t) =>
      for {
        sh <- SurtHost.surtHostFromUrl(s)
        th <- SurtHost.surtHostFromUrl(t)
      } yield (sh, th)
    }

  private def resolve(base: String, target: String): Option[String] = {
    val t = target.trim
    if (t.isEmpty || t.startsWith("#") || t.startsWith("javascript:") ||
      t.startsWith("mailto:") || t.startsWith("data:")) None
    else SurtHost.urlJoin(base, t)
  }

  private def firstText(n: JsonNode, names: String*): Option[String] =
    names.iterator.map(n.path(_).asText(null)).find(_ != null)

  private def forEachValue(n: JsonNode)(f: String => Unit): Unit = {
    if (n.isArray) n.forEach(v => f(v.asText("")))
    else if (!n.isMissingNode && !n.isNull) f(n.asText(""))
  }
}
