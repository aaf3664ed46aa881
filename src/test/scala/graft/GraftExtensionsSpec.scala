package graft

import graft.functions.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark-submit registration path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must expose the engine's
  * expression family in SQL with no driver-side registerAll call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions entry point registers the SQL expression surface") {
    val prev = TestSpark.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new SparkSession over the SAME SparkContext, extensions applied at
    // build time exactly as --conf spark.sql.extensions does
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT url_host('http://a.com:8080/x')     AS h,
          |       normalize_url('HTTP://A.com/x/')    AS n,
          |       url_path('http://a.com/x/y?q=1')    AS p,
          |       url_resolve('http://a.com/b/c', '../d') AS r,
          |       url_syntactic_valid('http://a.com') AS sv,
          |       url_security_valid('javascript:x')  AS sec
          |""".stripMargin).head()
      assert(r.getString(0) == "a.com:8080")
      assert(r.getString(1) == "http://a.com/x")
      assert(r.getString(2) == "/x/y")
      assert(r.getString(3) == "http://a.com/d")
      assert(r.getBoolean(4))
      assert(!r.getBoolean(5))
      assert(s2.sql("SELECT text_fingerprint('hello world hello')").head().get(0) != null)
      assert(s2.sql("SELECT url_pattern_key('http://a.com/cal/2026/08?d=1&m=2')")
        .head().getString(0) == "a.com/cal/#/#?d&m")
      assert(s2.sql("SELECT size(extract_hrefs('<a href=\"/x\">l</a>'))").head().getInt(0) == 1)
      // completeness: EVERY FunctionTable entry resolves through the
      // extensions path — a new expression cannot miss the spark-submit route
      graft.functions.FunctionTable.all.foreach { f =>
        assert(s2.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(f.name)),
          s"${f.name} not registered via extensions")
      }
      // round-4 image family evaluates end to end in SQL
      assert(s2.sql("SELECT sniff_image_format(X'FFD8FFE0')").head().getString(0) == "jpeg")
      assert(s2.sql("SELECT size(extract_sitemap_images(" +
        "'<image:image><image:loc>http://a/i.jpg</image:loc></image:image>'))")
        .head().getInt(0) == 1)
      assert(s2.sql("SELECT image_sig(X'00').decodable").head().getBoolean(0) == false)
    } finally {
      // restore the shared default session for the other suites; never stop
      // s2 — it shares the one SparkContext
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
