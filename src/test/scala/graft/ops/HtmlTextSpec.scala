package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class HtmlTextSpec extends AnyFunSuite {

  test("charset chain: declared beats sniffed, BOM detected") {
    val latin = "café".getBytes("ISO-8859-1")
    assert(HtmlText.decode(latin, Some("ISO-8859-1")) == "café")
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ "hé".getBytes("UTF-8")
    assert(HtmlText.decode(bom, None).contains("hé"))
    val meta = "<html><head><meta charset=\"iso-8859-1\"></head>café</html>"
      .getBytes("ISO-8859-1")
    assert(HtmlText.decode(meta, None).contains("café"))
  }

  test("strictUtf8 rejects malformed input") {
    assert(HtmlText.strictUtf8("ok".getBytes("UTF-8")).contains("ok"))
    assert(HtmlText.strictUtf8(Array(0xFF.toByte, 0xFE.toByte, 'a'.toByte)).isEmpty)
  }

  test("comments and nested script content stripped") {
    val html = "a<!-- <p>gone</p> -->b<script>if (x<y) {}</script>c"
    assert(HtmlText.extractText(html) == "a b c")
  }

  test("numeric and hex entities") {
    assert(Entities.decode("&#65;&#x42;&amp;") == "AB&")
    assert(Entities.decode("&bogus;") == "&bogus;")
  }

  test("whitespace normalized") {
    assert(HtmlText.extractText("<div>  a\n\n  b  </div>") == "a b")
  }

  test("mainContent keeps article paragraphs, drops chrome and link farms") {
    val p1 = "This opening paragraph carries the real story in well over ten words of body text."
    val p2 = "A second substantial paragraph continues the article with enough words to clear the floor."
    val html =
      s"""<html><head><title>T</title><style>.x{color:red}</style></head><body>
         |<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About this very long section name</a></li>
         |<li><a href="/c">Contact with many words in the anchor text here</a></li></ul></nav>
         |<header><h1>Site name and a long tagline that repeats on every page of the site</h1></header>
         |<article><p>$p1</p><p>$p2</p>
         |<p>Related: <a href="/x">one</a> <a href="/y">two</a> <a href="/z">three</a></p></article>
         |<div><a href="/l1">long anchor one here</a> <a href="/l2">long anchor two here</a>
         |<a href="/l3">long anchor three here</a> and barely any plain text</div>
         |<footer>Copyright 2026 Example Corp All rights reserved</footer>
         |</body></html>""".stripMargin
    val out = HtmlText.mainContent(html)
    assert(out.contains(p1) && out.contains(p2), s"article lost:\n$out")
    assert(!out.contains("Home") && !out.contains("Copyright") &&
      !out.contains("tagline"), s"chrome survived:\n$out")
    assert(!out.contains("long anchor one"), s"link farm survived:\n$out")
  }

  test("mainContent edge cases: plain text, short blocks, empty input") {
    // tagless input with enough words is one kept block
    val plain = "plain untagged text with definitely more than ten separate words in this single run"
    assert(HtmlText.mainContent(plain) == plain)
    // short fragments fall under the word floor
    assert(HtmlText.mainContent("<p>too short</p>") == "")
    assert(HtmlText.mainContent("") == "")
    // script/style bodies never reach scoring even with raw '<' inside
    val js = "<script>if (a<b) {alert('x')}</script><p>" + plain + "</p>"
    assert(HtmlText.mainContent(js) == plain)
  }
}
