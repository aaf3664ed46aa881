package graft.url

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY.md §5.2 item 2) over seeded URL-shaped
  * generators: canonicalization idempotence, absolute-reference resolution,
  * join/normalize closure, and validator total-ness (never throws).
  */
object UrlPropertiesSpec extends Properties("graft.url") {

  private val scheme = Gen.oneOf("http", "https", "HTTP", "Https")
  private val label = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString
  private val host = for {
    parts <- Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, label))
  } yield parts.mkString(".")
  private val port = Gen.oneOf(Gen.const(""), Gen.choose(1, 65535).map(p => s":$p"))
  private val pathSeg = Gen.oneOf(label, Gen.const("."), Gen.const(".."))
  private val path = Gen.choose(0, 5).flatMap(k => Gen.listOfN(k, pathSeg))
    .map(segs => if (segs.isEmpty) "" else "/" + segs.mkString("/"))
  private val queryPair = for { k <- label; v <- Gen.oneOf(label, Gen.const("")) } yield s"$k=$v"
  private val query = Gen.oneOf(
    Gen.const(""),
    Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, queryPair)).map("?" + _.mkString("&")))
  private val fragment = Gen.oneOf(Gen.const(""), label.map("#" + _))

  val urlGen: Gen[String] = for {
    s <- scheme; h <- host; p <- port; pa <- path; q <- query; f <- fragment
  } yield s"$s://$h$p$pa$q$f"

  private val refGen: Gen[String] = Gen.oneOf(
    path, query.map(q => q), fragment, label, urlGen,
    path.flatMap(p => query.map(q => p + q)))

  property("normalize is idempotent") = forAll(urlGen) { u =>
    val n = UrlNormalizer.normalize(u)
    UrlNormalizer.normalize(n) == n
  }

  property("normalize drops the fragment and default ports") = forAll(urlGen) { u =>
    val n = UrlNormalizer.normalize(u)
    !n.contains("#") && !n.matches("(?i)^http://[^/]*:80(/.*)?$") &&
      !n.matches("(?i)^https://[^/]*:443(/.*)?$")
  }

  // CPython lowercases the scheme while parsing, so an uppercase-scheme
  // absolute ref comes back scheme-lowered; compare canonical forms.
  property("urljoin of an absolute http(s) reference is that reference (canonically)") =
    forAll(urlGen, urlGen) { (base, abs) =>
      UrlNormalizer.normalize(PyUrl.urljoin(base, abs)) == UrlNormalizer.normalize(abs)
    }

  property("urljoin of a lowercase absolute reference is the reference verbatim") =
    forAll(urlGen, urlGen) { (base, abs0) =>
      val abs = abs0.replaceFirst("^[Hh][Tt][Tt][Pp]([Ss]?)", "http$1").toLowerCase
      PyUrl.urljoin(base, abs) == abs
    }

  property("urljoin result re-parses with the base scheme or ref scheme") =
    forAll(urlGen, refGen) { (base, ref) =>
      val joined = PyUrl.urljoin(base, ref)
      val s = PyUrl.urlparse(joined).scheme
      s == PyUrl.urlparse(base).scheme.toLowerCase || s == PyUrl.urlparse(ref).scheme
    }

  property("join-then-normalize equals normalize of join (closure)") =
    forAll(urlGen, refGen) { (base, ref) =>
      val j = PyUrl.urljoin(base, ref)
      UrlNormalizer.normalize(UrlNormalizer.normalize(j)) == UrlNormalizer.normalize(j)
    }

  property("validators are total (never throw) on arbitrary strings") =
    forAll(Gen.oneOf(urlGen, Gen.asciiPrintableStr, Gen.const(""))) { s =>
      UrlValidator.syntacticOk(s); UrlValidator.securityOk(s)
      UrlValidator.semanticOkPure(s); true
    }

  property("normalized query keys are sorted and unique") = forAll(urlGen) { u =>
    val n = UrlNormalizer.normalize(u)
    val q = PyUrl.urlparse(n).query
    if (q.isEmpty) true
    else {
      val keys = q.split("&").map(_.split("=", 2)(0)).toSeq
      keys == keys.sorted && keys.distinct == keys
    }
  }
}
