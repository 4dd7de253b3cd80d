package graft.ops

import java.net.IDN

/** SURT host normalization (reference wat_extract_links.py:344-407, P11) —
  * the workhorse scalar function of the host-graph pipeline — plus the
  * validation UDFs of hostlinks_to_graph.py:48-76 (P12).
  */
object SurtHost {

  private val HostFromUrl = """^https?://([^/?#@]*@)?([^/?#:]+)""".r
  private val Ipv4 = """^\d{1,3}(\.\d{1,3}){3}$""".r

  /** Extract the hostname from a URL; lenient like Python urlparse. */
  def hostOf(url: String): Option[String] =
    HostFromUrl.findFirstMatchIn(url).map(_.group(2)).orElse {
      try Option(new java.net.URI(url).getHost)
      catch { case _: Exception => None }
    }

  /** Normalize + reverse a host name to SURT form (`com.example`).
    * Returns None for IPs, single-label hosts, over-long hosts/labels,
    * or labels IDNA fails on — matching the reference's rejects.
    */
  def reverseHost(host: String): Option[String] = {
    var h = host.toLowerCase.stripSuffix(".")
    if (h.startsWith("www.") && h.length > 8) h = h.substring(4)
    if (h.isEmpty || h.length > 253) return None
    if (Ipv4.matches(h)) return None
    val labels0 = h.split('.')
    if (labels0.length < 2) return None
    val labels = new Array[String](labels0.length)
    var i = 0
    while (i < labels0.length) {
      var l = labels0(i)
      if (l.isEmpty) return None
      if (!isAscii(l)) {
        l = try IDN.toASCII(l) catch { case _: Exception => return None }
      }
      if (l.length > 63) return None
      labels(i) = l
      i += 1
    }
    Some(labels.reverse.mkString("."))
  }

  /** URL → SURT host in one step. */
  def surtHostFromUrl(url: String): Option[String] =
    hostOf(url).flatMap(reverseHost)

  /** reverse_host_is_valid (hostlinks_to_graph.py:48-63): first label of
    * the reversed host must be a registered TLD.
    */
  def reverseHostIsValid(revHost: String): Boolean = {
    if (revHost == null || revHost.isEmpty) return false
    val tld = revHost.takeWhile(_ != '.')
    tld.nonEmpty && !tld.forall(_.isDigit) && IanaTlds.contains(tld)
  }

  /** reverse_host_normalize (hostlinks_to_graph.py:65-76): per-label IDNA
    * of an already-reversed host; None when any label fails.
    */
  def reverseHostNormalize(revHost: String): Option[String] = {
    val labels = revHost.split('.')
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val l = labels(i)
      if (l.isEmpty) return None
      out(i) =
        if (isAscii(l)) l.toLowerCase
        else try IDN.toASCII(l).toLowerCase catch { case _: Exception => return None }
      i += 1
    }
    Some(out.mkString("."))
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) > 127) return false; i += 1 }
    true
  }

  /** Lenient URL resolution: Python urljoin accepts garbage that
    * java.net.URI throws on (SURVEY §7.4); catch-and-None like
    * wat_extract_links.py:196-199.
    */
  def urlJoin(base: String, rel: String): Option[String] = {
    try {
      val r = rel.trim
      if (r.isEmpty) return Some(base)
      if (r.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) return Some(r)
      val resolved = new java.net.URI(base).resolve(sanitize(r))
      Some(resolved.toString)
    } catch {
      case _: Exception =>
        // best-effort fallbacks for inputs URI rejects but urljoin accepts
        try {
          if (rel.startsWith("//")) Some("http:" + rel)
          else if (rel.startsWith("/")) {
            val b = new java.net.URI(base)
            Some(s"${b.getScheme}://${b.getAuthority}$rel")
          } else None
        } catch { case _: Exception => None }
    }
  }

  private def sanitize(r: String): String =
    r.replace(" ", "%20").replace("|", "%7C").replace("{", "%7B")
      .replace("}", "%7D").replace("^", "%5E").replace("`", "%60")
      .replace("\"", "%22").replace("\\", "%5C").replace("<", "%3C")
      .replace(">", "%3E")
}
