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
}
