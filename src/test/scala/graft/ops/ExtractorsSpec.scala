package graft.ops

import graft.warc.Fixtures
import org.scalatest.funsuite.AnyFunSuite

class ExtractorsSpec extends AnyFunSuite {

  test("server names: distinct per response, fallback key") {
    val got = Extractors.serverNames(Fixtures.responseHtml).toMap
    assert(got == Map("Apache/2.4" -> 1L, "nginx" -> 1L)) // dup Apache collapsed
    val none = Extractors.serverNames(Fixtures.responseNoServer).toMap
    assert(none == Map(Extractors.NoServer -> 1L))
    assert(Extractors.serverNames(Fixtures.wetText).isEmpty)
  }

  test("html tag counts") {
    val got = Extractors.htmlTagCounts(Fixtures.responseHtml).toMap
    assert(got("html") == 1L)
    assert(got("p") >= 1L)
    assert(got("a") == 1L)
    assert(got.contains("script")) // raw regex counts script tags too
  }

  test("host/ip pairs") {
    val got = Extractors.hostIpPairs(Fixtures.responseHtml).toVector
    assert(got == Vector(((("www.example.com"), "93.184.216.34"), 1L)))
  }

  test("word counts: unicode tokens, per-doc tf") {
    val got = Extractors.wordCounts(Fixtures.wetText).toMap
    assert(got("hello") == ((3L, 1L)))
    assert(got("café") == ((1L, 1L)))
    assert(got("123") == ((1L, 1L)))
    assert(got("line") == ((1L, 1L)))
  }

  test("WAT-path server names: scalar and list-valued headers") {
    val got = Extractors.serverNamesWat(Fixtures.watJson).toMap
    assert(got == Map("Apache/2.4" -> 1L))
    assert(Extractors.serverNamesWat(Fixtures.responseHtml).isEmpty)
  }

  test("redirect links resolve Location against source") {
    val got = Extractors.redirectLinks(Fixtures.responseRedirect).toVector
    assert(got == Vector(("http://old.example.org/here", "http://old.example.org/there")))
    assert(Extractors.redirectLinks(Fixtures.responseHtml).isEmpty)
  }

  test("sitemaps: absolute + relative, host attribution") {
    val got = Extractors.sitemapUrls(Fixtures.robotsTxt).toVector
    assert(got.contains(("https://www.example.com/sitemap.xml", "www.example.com")))
    assert(got.contains(("https://www.example.com/sitemap2.xml", "www.example.com")))
  }

  test("sitemaps: non-UTF8 body skipped (strict decode)") {
    assert(Extractors.sitemapUrls(Fixtures.robotsUtf16).isEmpty)
  }

  test("sitemaps: non-200 skipped and cap respected") {
    val r404 = Fixtures.robots("https://x.example.com/robots.txt",
      "Sitemap: https://x.example.com/s.xml\n".getBytes("UTF-8"), "HTTP/1.1 404 Not Found")
    assert(Extractors.sitemapUrls(r404).isEmpty)
    val many = Fixtures.robots("https://big.example.com/robots.txt",
      (1 to 60).map(i => s"Sitemap: https://big.example.com/s$i.xml").mkString("\n").getBytes("UTF-8"))
    assert(Extractors.sitemapUrls(many, maxPerFile = 50).size == 50)
  }

  test("sitemap host edges: cross-host only, SURT form") {
    val cross = Fixtures.robots("https://www.a.com/robots.txt",
      "Sitemap: https://cdn.b.org/sitemap.xml\nSitemap: https://www.a.com/self.xml\n".getBytes("UTF-8"))
    val got = Extractors.sitemapHostEdges(cross).toVector
    assert(got == Vector(("com.a", "org.b.cdn")))
  }

  test("robots rules: agent groups, allow/disallow, shared groups") {
    val robots = Fixtures.robots("https://www.rules.example.com/robots.txt",
      ("User-agent: *\nDisallow: /private\nAllow: /public\n\n" +
        "User-agent: googlebot\nUser-agent: bingbot\nDisallow: /no-bots\n").getBytes("UTF-8"))
    val rules = Extractors.robotsRules(robots).toVector
    assert(rules.contains(Extractors.RobotsRule("www.rules.example.com", "*", "disallow", "/private")))
    assert(rules.contains(Extractors.RobotsRule("www.rules.example.com", "*", "allow", "/public")))
    // the two-agent group shares its rule
    assert(rules.contains(Extractors.RobotsRule("www.rules.example.com", "googlebot", "disallow", "/no-bots")))
    assert(rules.contains(Extractors.RobotsRule("www.rules.example.com", "bingbot", "disallow", "/no-bots")))
    assert(!rules.exists(r => r.agent == "googlebot" && r.path == "/private"))
  }

  test("robotsAllowed: RFC 9309 longest-match, wildcards, anchors, agent groups") {
    import Extractors.{RobotsRule => R, robotsAllowed => allowed}
    val h = "h"
    val rules = Seq(
      R(h, "*", "disallow", "/foo"),
      R(h, "*", "allow", "/foo/bar"),
      R(h, "*", "disallow", "/*.php$"),
      R(h, "*", "disallow", "/tmp/*"),
      R(h, "specialbot", "disallow", "/"))
    // prefix match and longest-match-wins
    assert(!allowed(rules, "anybot", "/foo/baz"))
    assert(allowed(rules, "anybot", "/foo/bar/deep"))   // allow /foo/bar longer than /foo
    // wildcard and $ anchor
    assert(!allowed(rules, "anybot", "/index.php"))
    assert(allowed(rules, "anybot", "/index.php?x=1"))  // $ anchored, query breaks it
    assert(!allowed(rules, "anybot", "/tmp/scratch/a"))
    // no matching rule → allowed
    assert(allowed(rules, "anybot", "/open"))
    // agent-specific group REPLACES the * group entirely
    assert(!allowed(rules, "SpecialBot", "/open"))
    // tie between allow and disallow of equal length → allow wins
    val tie = Seq(R(h, "*", "allow", "/p"), R(h, "*", "disallow", "/p"))
    assert(allowed(tie, "x", "/p/q"))
    // empty rule set and empty-path disallow → allowed
    assert(allowed(Nil, "x", "/anything"))
    assert(allowed(Seq(R(h, "*", "disallow", "")), "x", "/anything"))
  }

  test("html links: href/src extracted, base honored, junk filtered") {
    val page = Fixtures.response("https://www.links.example.com/dir/page.html",
      ("""<html><head><base href="https://cdn.links.example.com/assets/">
        |<link rel="stylesheet" href="style.css"></head>
        |<body><a href="https://other.example.org/x">x</a>
        |<a href="relative.html">rel</a>
        |<img src="/img/pic.png"><a href="#frag">frag</a>
        |<a href="mailto:a@b.c">mail</a>
        |<script src="app.js"></script></body></html>""").stripMargin.getBytes("UTF-8"),
      warcHeaders = Map("WARC-Identified-Payload-Type" -> "text/html"))
    val targets = Extractors.htmlLinks(page).map(_._2).toSet
    assert(targets.contains("https://cdn.links.example.com/assets/style.css"))
    assert(targets.contains("https://other.example.org/x"))
    assert(targets.contains("https://cdn.links.example.com/assets/relative.html"))
    assert(targets.contains("https://cdn.links.example.com/img/pic.png"))
    assert(targets.contains("https://cdn.links.example.com/assets/app.js"))
    assert(targets.contains("https://www.links.example.com/dir/page.html")) // self-edge
    assert(!targets.exists(t => t.contains("mailto") || t.contains("#")))
  }

  test("anchor texts: inner markup stripped, base resolved, junk and empties dropped") {
    val page = Fixtures.response("https://www.links.example.com/dir/page.html",
      ("""<html><head><base href="https://cdn.links.example.com/assets/"></head>
        |<body><a href="https://other.example.org/x">Visit <b>Other</b> Site</a>
        |<a href="relative.html">Rel &amp; Page</a>
        |<a href="/abs">  spaced   words  </a>
        |<a href="#frag">fragment text</a>
        |<a href="mailto:a@b.c">mail me</a>
        |<a href="empty.html"><img src="i.png"></a>
        |<a href="long.html">""" + ("w " * 150) + """</a></body></html>""")
        .stripMargin.getBytes("UTF-8"),
      warcHeaders = Map("WARC-Identified-Payload-Type" -> "text/html"))
    val pairs = Extractors.anchorTexts(page).toSeq
    assert(pairs.contains(("https://other.example.org/x", "Visit Other Site")))
    assert(pairs.contains(("https://cdn.links.example.com/assets/relative.html", "Rel & Page")))
    assert(pairs.contains(("https://cdn.links.example.com/abs", "spaced words")))
    assert(!pairs.exists(_._2 == "fragment text"))        // #fragment target
    assert(!pairs.exists(_._2 == "mail me"))              // mailto target
    assert(!pairs.exists(_._1.endsWith("empty.html")))    // image-only anchor
    assert(!pairs.exists(_._1.endsWith("long.html")))     // 300-char label cap
    // non-HTML records yield nothing
    assert(Extractors.anchorTexts(Fixtures.responseRedirect).isEmpty)
  }

  test("htmlToText end-to-end: tags stripped, entities decoded") {
    val txt = Extractors.htmlToText(Fixtures.responseHtml).get
    assert(txt.contains("Hello é"))
    assert(txt.contains("T & T"))
    assert(txt.contains("World bold"))
    assert(!txt.contains("ignored"))   // script stripped
    assert(!txt.contains("color"))     // style stripped
    assert(!txt.contains("<"))
  }
}
