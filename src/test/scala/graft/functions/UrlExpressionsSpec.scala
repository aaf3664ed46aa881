package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.url.{PyUrl, UrlNormalizer}

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class UrlExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val urls = Seq(
    "https://Example.COM:443/Path/?b=2&a=1&a=9#frag",
    "http://example.com:80/a/b//",
    "http://sub.example.com:8080/x?y",
    "not a url",
    "http://example.com/?q=%3D%26&q=last")

  test("NormalizeUrl matches pure function through a Spark plan (codegen)") {
    val got = urls.toDF("url")
      .select($"url", UrlFunctions.normalize_url($"url").as("norm"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach(u => assert(got(u) == UrlNormalizer.normalize(u), u))
  }

  test("UrlResolve matches PyUrl.urljoin; null-intolerant") {
    val pairs = Seq(
      ("http://a.com/b/c", "../d"),
      ("http://a.com/b/c", "?q=2"),
      ("http://a.com/b/", "//other.com/z"),
      ("http://a.com/x", "mailto:x@y.com"))
    val got = pairs.toDF("base", "ref")
      .select(UrlFunctions.url_resolve($"base", $"ref")).as[String].collect()
    assert(got.toSeq == pairs.map { case (b, r) => PyUrl.urljoin(b, r) })
    val withNull = Seq(("http://a.com", null: String)).toDF("base", "ref")
      .select(UrlFunctions.url_resolve($"base", $"ref")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("UrlHost keeps the port (unlike parse_url HOST)") {
    val got = Seq("http://h.com:8080/x").toDF("u")
      .select(UrlFunctions.url_host($"u")).as[String].head()
    assert(got == "h.com:8080")
  }

  test("SQL registration + validity predicates") {
    UrlFunctions.registerAll(spark)
    urls.toDF("url").createOrReplaceTempView("u")
    val n = spark.sql(
      "SELECT url, normalize_url(url) AS norm, url_host(url) AS host, " +
      "url_syntactic_valid(url) AS ok, url_security_valid(url) AS sec FROM u")
      .collect()
    assert(n.length == urls.length)
    val okMap = n.map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(!okMap("not a url"))
    assert(okMap("http://example.com:80/a/b//"))
  }

  test("extract_hrefs pulls anchors in document order") {
    val html = """<html><body>
      <a href="/page1">one</a>
      <A HREF='page2'>two</A>
      <a class="x" href=page3>three</a>
      <a name="no-href">skip</a>
      <a href="mailto:a@b.c">mail</a>
    </body></html>"""
    val got = Seq(html).toDF("html")
      .select(UrlFunctions.extract_hrefs($"html")).as[Seq[String]].head()
    assert(got == Seq("/page1", "page2", "page3", "mailto:a@b.c"))
  }

  test("url_seen_key is stable across plans and equals xxhash64(normalized)") {
    val df = urls.toDF("url")
    val a = df.select(UrlFunctions.url_seen_key($"url")).as[Long].collect()
    val b = df.select(xxhash64(UrlFunctions.normalize_url($"url"))).as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("expressions stay inside WholeStageCodegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", concat(lit("http://example.com/doc/"), $"doc_id", lit("?B=2&a=1")))
    val plan = docs
      .select(UrlFunctions.normalize_url($"url").as("n"))
      .filter(UrlFunctions.url_syntactic_valid($"n"))
      .queryExecution.executedPlan.toString
    // the "*(1)" prefix marks operators fused into WholeStageCodegen stage 1;
    // both the Project (normalize) and the Filter (validity) must carry it
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("*(1) Filter"), plan)
    val rows = docs.select(UrlFunctions.normalize_url($"url").as("n"))
      .filter(UrlFunctions.url_syntactic_valid($"n")).count()
    assert(rows > 0)
  }

  test("resolved_link_digest: set semantics — order/spelling-insensitive, set-sensitive") {
    def digest(base: String, links: Seq[String]): Long =
      Seq((base, links)).toDF("base", "links")
        .select(UrlFunctions.resolved_link_digest($"base", $"links"))
        .as[Long].head()
    val base = "http://example.com/dir/page.html"
    val d1 = digest(base, Seq("/a", "b.html", "http://other.com/x?B=2&a=1"))
    // document order must not matter
    assert(digest(base, Seq("b.html", "http://other.com/x?B=2&a=1", "/a")) == d1)
    // different href SPELLINGS of the same resolved+normalized set
    assert(digest(base, Seq("http://example.com/a", "./b.html",
      "http://other.com/x?B=2&a=1")) == d1)
    // a different set digests differently
    assert(digest(base, Seq("/a", "b.html")) != d1)
    assert(digest(base, Seq("/a", "b.html", "http://other.com/y?B=2&a=1")) != d1)
    // exact duplicates collapse to... no: duplicates are part of the list;
    // the sorted MULTISET is hashed, so a repeated element changes the digest
    assert(digest(base, Seq("/a", "/a", "b.html",
      "http://other.com/x?B=2&a=1")) != d1)
    // but the same page linking the same URL under two spellings digests
    // as the multiset of RESOLVED urls — ["/a", "./../a"] == ["/a", "/a"]
    assert(digest(base, Seq("/a", "./../a")) == digest(base, Seq("/a", "/a")))
    // null base → null (null-intolerant)
    val r = Seq((Option.empty[String], Seq("/a"))).toDF("base", "links")
      .select(UrlFunctions.resolved_link_digest($"base", $"links")).head()
    assert(r.isNullAt(0))
  }

  test("resolved_link_digest: equals the mirror-suppression lambda's SET verdicts; codegen'd") {
    // parquet-backed so the assertion sees the real codegen'd plan
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("http://example.com/d/"), $"doc_id").as("url"),
        array(concat(lit("/p/"), pmod($"doc_id", lit(7))),
          lit("next"), concat(lit("x?q="), pmod($"doc_id", lit(3)))).as("links"))
    val viaExpr = docs.select($"url",
      UrlFunctions.resolved_link_digest($"url", $"links").as("d"))
    val plan = viaExpr.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // the digest partitions rows exactly like the interpreted lambda form:
    // same equality classes (values differ by construction — chained XXH64
    // vs array-hash — but the CONSUMER only compares digests to digests)
    val viaLambda = docs.select($"url",
      xxhash64(sort_array(transform($"links",
        h => UrlFunctions.normalize_url(UrlFunctions.url_resolve($"url", h))))).as("d"))
    def classes(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
      df.as[(String, Long)].collect().groupBy(_._2).values
        .map(_.map(_._1).toSet).toSet
    assert(classes(viaExpr) == classes(viaLambda))
  }
}
