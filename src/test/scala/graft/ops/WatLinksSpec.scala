package graft.ops

import graft.warc.Fixtures
import org.scalatest.funsuite.AnyFunSuite

class WatLinksSpec extends AnyFunSuite {

  test("WAT link extraction: headers, head, metas, scripts, body, base") {
    val links = WatLinks.extractLinks(Fixtures.watJson).toVector
    val targets = links.map(_._2).toSet
    val src = "https://www.example.com/page.html"
    assert(links.forall(_._1 == src))
    assert(targets.contains("https://cdn.example.net/style.css"))     // Link header
    assert(targets.contains("https://www.example.com/base/favicon.ico")) // base-resolved
    assert(targets.contains("https://img.example.org/pic.png"))       // og:image
    assert(targets.contains("https://www.example.com/base/app.js"))   // script
    assert(targets.contains("https://other.example.org/x"))           // body link
    assert(targets.contains("https://www.example.com/base/relative/page.html"))
    assert(targets.contains(src))                                     // self-edge
    assert(!targets.exists(_.startsWith("mailto:")))                  // filtered
    assert(!targets.contains("not a link"))                           // non-whitelisted meta
  }

  test("host edges in SURT form") {
    val edges = WatLinks.hostEdges(Fixtures.watJson).toSet
    assert(edges.contains(("com.example", "net.example.cdn")))
    assert(edges.contains(("com.example", "org.example.img")))
    assert(edges.contains(("com.example", "com.example"))) // self-edge preserved here
  }

  test("non-WAT records yield nothing") {
    assert(WatLinks.extractLinks(Fixtures.responseHtml).isEmpty)
  }
}
