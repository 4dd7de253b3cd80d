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
}
