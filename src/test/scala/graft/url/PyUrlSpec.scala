package graft.url

import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64
import scala.io.Source

/** Golden-vector parity: the Scala URL core must reproduce CPython 3.11
  * `urllib.parse` + the reference normalizer byte-for-byte on the vector
  * corpus in src/test/resources (generated from the Python stdlib). */
class PyUrlSpec extends AnyFunSuite {

  private def vectors(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream("/" + name)
    require(in != null, s"missing resource $name")
    val dec = Base64.getDecoder
    Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).map {
      line => line.split("\t", -1).map(f => new String(dec.decode(f), "UTF-8"))
    }.toSeq
  }

  test("urlparse matches CPython on vector corpus") {
    vectors("urlparse_vectors.tsv").foreach { case Array(u, sch, nl, pth, prm, q, frag) =>
      val p = PyUrl.urlparse(u)
      assert((p.scheme, p.netloc, p.path, p.params, p.query, p.fragment) ==
        ((sch, nl, pth, prm, q, frag)), s"urlparse($u)")
    }
  }

  test("urljoin matches CPython on vector corpus") {
    vectors("urljoin_vectors.tsv").foreach { case Array(b, r, expect) =>
      assert(PyUrl.urljoin(b, r) == expect, s"urljoin($b, $r)")
    }
  }

  test("normalize matches reference normalizer on vector corpus") {
    vectors("normalize_vectors.tsv").foreach { case Array(u, expect) =>
      assert(UrlNormalizer.normalize(u) == expect, s"normalize($u)")
    }
  }

  // Pinned cases ported from /root/reference/test/utils/test_url_normalizer.py
  test("normalizer pinned reference cases") {
    val cases = Seq(
      "https://example.com/path/" -> "https://example.com/path",
      "https://example.com/" -> "https://example.com/",
      "HTTPS://EXAMPLE.COM/path" -> "https://example.com/path",
      "https://example.com:443/path" -> "https://example.com/path",
      "http://example.com:80/path" -> "http://example.com/path",
      "https://example.com:8080/path" -> "https://example.com:8080/path",
      "https://example.com/path#section" -> "https://example.com/path",
      "https://example.com/path?b=2&a=1" -> "https://example.com/path?a=1&b=2",
      "https://example.com/path?a=1&a=2" -> "https://example.com/path?a=2",
      "https://example.com/path?" -> "https://example.com/path",
      "not-a-url" -> "not-a-url")
    cases.foreach { case (in, out) => assert(UrlNormalizer.normalize(in) == out, in) }
    // idempotence on the pinned inputs
    cases.foreach { case (in, _) =>
      val once = UrlNormalizer.normalize(in)
      assert(UrlNormalizer.normalize(once) == once, s"idempotence($in)")
    }
  }

  test("redirect loop classification priority (reference test_redirect_handler.py)") {
    // no loop
    assert(!RedirectLoop.detect(Seq("http://a.com/1"), "http://a.com/2").isLoop)
    // max redirects
    val long = (1 to 10).map(i => s"http://a.com/$i")
    assert(RedirectLoop.detect(long, "http://a.com/11").loopType.contains("max_redirects"))
    // reverse A -> B -> A
    assert(RedirectLoop.detect(Seq("http://a.com/A", "http://a.com/B"), "http://a.com/A")
      .loopType.contains("reverse"))
    // circular A -> B -> C -> A
    assert(RedirectLoop.detect(
      Seq("http://a.com/A", "http://a.com/B", "http://a.com/C"), "http://a.com/A")
      .loopType.contains("circular"))
    // "infinite" chain where chain(-2) == newUrl is classified reverse (priority pinned)
    assert(RedirectLoop.detect(
      Seq("http://a.com/X", "http://a.com/Y", "http://a.com/X", "http://a.com/Y"), "http://a.com/X")
      .loopType.contains("reverse"))
    // genuine infinite: immediate self-redirect (A -> A)
    assert(RedirectLoop.detect(Seq("http://a.com/A"), "http://a.com/A")
      .loopType.contains("infinite"))
  }

  // Pinned matrices from /root/reference/test/utils/test_url_verifier.py
  test("validator matrices") {
    val valid = Seq(
      "http://example.com", "https://example.com", "https://example.com/path",
      "https://example.com:8080/path", "https://sub.example.com",
      "https://example.com/path?query=value", "http://93.184.216.34")
    valid.foreach(u => assert(UrlValidator.syntacticOk(u), s"syntacticOk($u)"))
    val invalid = Seq(
      "", "   ", "ftp://example.com", "example.com", "http://", "https://",
      "http:// example.com", " http://example.com", "http://example.com ",
      "http://exa mple.com/path", "http://example.com:99999", "http://example.com:0",
      "http://example.com:abc", "http://example.com/<script>", "http://example.com/'quote'",
      "http://-bad.com", "http://bad-.com")
    invalid.foreach(u => assert(!UrlValidator.syntacticOk(u), s"!syntacticOk($u)"))

    // domain rules: label ≤63, total ≤253
    assert(UrlValidator.isValidDomain("a" * 63 + ".com"))
    assert(!UrlValidator.isValidDomain("a" * 64 + ".com"))
    val longDomain = (Seq.fill(60)("abc").mkString(".")) // 239 chars, ok
    assert(UrlValidator.isValidDomain(longDomain))
    assert(!UrlValidator.isValidDomain("ab." * 85 + "com")) // >253

    // IPs
    Seq("192.168.1.1", "8.8.8.8", "255.255.255.255", "::1", "2001:db8::1")
      .foreach(ip => assert(UrlValidator.isValidIp(ip), ip))
    Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "01.2.3.4", "")
      .foreach(ip => assert(!UrlValidator.isValidIp(ip), ip))
    // scoped IPv6 (CPython ipaddress 3.9+ zone-id rules)
    Seq("fe80::1%lo0", "::1%eth0", "fe80::1%0")
      .foreach(ip => assert(UrlValidator.isValidIp(ip), ip))
    Seq("fe80::1%", "fe80::1%e%x", "%lo0", "1.2.3.4%lo0")
      .foreach(ip => assert(!UrlValidator.isValidIp(ip), ip))

    // reserved TLDs / private IPs (pure semantic stage)
    Seq("http://foo.invalid/x", "http://site.example", "http://x.test", "http://h.localhost",
      "http://10.0.0.1/x", "http://192.168.1.5", "http://172.16.0.1")
      .foreach(u => assert(!UrlValidator.semanticOkPure(u), u))
    assert(UrlValidator.semanticOkPure("http://example.com"))

    // security stage
    Seq("javascript:alert(1)", "data:text/html,hi", "file:///etc/passwd",
      "ftp://x.com", "mailto:a@b.com", "tel:+15551234567",
      "http://localhost/x", "http://127.0.0.1/x", "http://0.0.0.0/",
      "http://192.168.0.1/x", "http://10.1.2.3/x", "http://172.31.9.9/x")
      .foreach(u => assert(!UrlValidator.securityOk(u), u))
    Seq("http://example.com", "https://example.com/path", "http://172.32.0.1")
      .foreach(u => assert(UrlValidator.securityOk(u), u))
  }
}
