package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §2: reference cases from wat_extract_links.py:344-407 and
  * hostlinks_to_graph.py:42-76.
  */
class SurtHostSpec extends AnyFunSuite {

  test("basic reversal and www stripping") {
    assert(SurtHost.reverseHost("example.com").contains("com.example"))
    assert(SurtHost.reverseHost("www.example.com").contains("com.example"))
    assert(SurtHost.reverseHost("a.b.example.co.uk").contains("uk.co.example.b.a"))
    // short host: www. kept when stripping would leave too little
    assert(SurtHost.reverseHost("www.com").contains("com.www"))
  }

  test("trailing dot and case") {
    assert(SurtHost.reverseHost("Example.COM.").contains("com.example"))
  }

  test("rejects: IPs, single label, overlong") {
    assert(SurtHost.reverseHost("1.2.3.4").isEmpty)
    assert(SurtHost.reverseHost("www.1.2.3.4").isEmpty)
    assert(SurtHost.reverseHost("localhost").isEmpty)
    assert(SurtHost.reverseHost("a" * 254 + ".com").isEmpty)
    assert(SurtHost.reverseHost(("a" * 64) + ".com").isEmpty)
  }

  test("IDNA encoding of non-ASCII labels") {
    val r = SurtHost.reverseHost("müller.de")
    assert(r.contains("de.xn--mller-kva"))
  }

  test("hostOf lenient URL parsing") {
    assert(SurtHost.hostOf("https://www.example.com/path?q=1").contains("www.example.com"))
    assert(SurtHost.hostOf("http://user@host.org:8080/x").contains("host.org"))
    assert(SurtHost.hostOf("not a url").isEmpty)
  }

  test("reverseHostIsValid TLD check") {
    assert(SurtHost.reverseHostIsValid("com.example"))
    assert(SurtHost.reverseHostIsValid("de.example"))
    assert(!SurtHost.reverseHostIsValid("invalidtld.example"))
    assert(!SurtHost.reverseHostIsValid("123.example"))
    assert(!SurtHost.reverseHostIsValid(""))
    // exact IANA snapshot semantics (iana_tld.py:4-264): retired ccTLDs
    // and unregistered punycode labels are NOT valid TLDs
    assert(!SurtHost.reverseHostIsValid("an.example"))  // Netherlands Antilles, retired
    assert(!SurtHost.reverseHostIsValid("tp.example"))  // East Timor, retired
    assert(SurtHost.reverseHostIsValid("io.example"))
    assert(SurtHost.reverseHostIsValid("xn--p1ai.example"))     // .рф
    assert(!SurtHost.reverseHostIsValid("xn--garbage.example")) // not registered
  }

  test("reverseHostNormalize per-label IDNA") {
    assert(SurtHost.reverseHostNormalize("com.example").contains("com.example"))
    assert(SurtHost.reverseHostNormalize("de.müller").contains("de.xn--mller-kva"))
    assert(SurtHost.reverseHostNormalize("com..x").isEmpty)
  }

  test("urlJoin tolerance (python-urljoin-ish)") {
    assert(SurtHost.urlJoin("http://a.com/dir/page", "other").contains("http://a.com/dir/other"))
    assert(SurtHost.urlJoin("http://a.com/dir/", "/abs").contains("http://a.com/abs"))
    assert(SurtHost.urlJoin("http://a.com/x", "https://b.org/y").contains("https://b.org/y"))
    assert(SurtHost.urlJoin("http://a.com/x", "//cdn.c.net/z").contains("http://cdn.c.net/z"))
    // spaces and odd chars don't throw
    assert(SurtHost.urlJoin("http://a.com/x", "a b").isDefined)
  }
}
