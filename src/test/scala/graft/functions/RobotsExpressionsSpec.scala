package graft.functions

import graft.functions.{RobotsFunctions => RF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd longest-match expression must agree with the interpreted
  * HOF formulation it replaced on every rule shape (the RFC 9309 verdicts
  * RobotsSpec pins end-to-end are computed through it), share its null
  * semantics, and stay inside WholeStageCodegen. */
class RobotsExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the exact column program politeBatch used before the native expression
  private val hof =
    "aggregate(filter(dis, p -> startswith(path, p)), 0, (acc, p) -> greatest(acc, length(p))) <= " +
      "aggregate(filter(allow, p -> startswith(path, p)), 0, (acc, p) -> greatest(acc, length(p)))"

  test("agrees with the HOF longest-match fold on a randomized rule matrix") {
    val rnd = new scala.util.Random(42)
    val pieces = Seq("/", "/a", "/a/", "/a/b", "/ab", "/b/", "/a/b/c", "/統", "/統計", "/x?q=1")
    def rules() = Seq.fill(rnd.nextInt(5))(pieces(rnd.nextInt(pieces.length)))
    val rows = Seq.tabulate(400) { i =>
      val path = pieces(rnd.nextInt(pieces.length)) + (if (i % 3 == 0) "/" else "")
      (path, rules(), rules())
    } ++ Seq(
      ("/a/b/", Seq.empty[String], Seq.empty[String]),      // no rules: 0 <= 0
      ("/a/b/", Seq("/a"), Seq("/a")),                       // tie: allow wins
      ("/a/b/", Seq("/a/b"), Seq("/a")),                     // longer disallow wins
      ("/統計/", Seq("/統計"), Seq("/統")),                   // multi-byte char lengths
      ("/a/b/", Seq("/a", null, "/a/b"), Seq(null, "/a/b"))) // null elements skipped
    val df = rows.toDF("path", "dis", "allow")
      .withColumn("native", RF.robots_allowed($"path", $"dis", $"allow"))
      .withColumn("ref", expr(hof))
    assert(df.filter($"native" =!= $"ref" ||
      $"native".isNull =!= $"ref".isNull).count() == 0)
    // sanity: both verdicts occur in the matrix
    assert(df.filter($"native").count() > 0)
    assert(df.filter(!$"native").count() > 0)
  }

  test("RFC 9309 wildcards: * spans segments, $ anchors, plain rules unchanged") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    def len(path: String, rules: String*): Int =
      RobotsKernels.bestMatchLen(UTF8String.fromString(path),
        ArrayData.toArrayData(rules.map(UTF8String.fromString).toArray))
    // $ anchor: extension rule hits only at end-of-path
    assert(len("/docs/a.pdf", "/*.pdf$") == 7)
    assert(len("/docs/a.pdfx", "/*.pdf$") == 0)
    assert(len("/a.pdf/b", "/*.pdf$") == 0)
    // unanchored * rule is a substring-in-order prefix match
    assert(len("/docs/a.pdf?x=1", "/*.pdf") == 6)
    assert(len("/private/x/data", "/private*/data") == 14)
    assert(len("/private/x/docs", "/private*/data") == 0)
    // multiple stars; star matches empty
    assert(len("/a/b/c", "/a*b*c") == 6)
    assert(len("/abc", "/a*b*c") == 6)
    assert(len("/a/c/b", "/a*b*c") == 0)
    // exact-path anchor; one trailing slash is tolerated because the
    // scheduler's subject is the canonical path + "/" (a $ rule must
    // anchor at the canonical resource boundary or it could never fire
    // through politeBatch)
    assert(len("/a", "/a$") == 3)
    assert(len("/a/", "/a$") == 3)
    assert(len("/a/b", "/a$") == 0)
    assert(len("/a//", "/a$") == 0) // only ONE canonical slash stripped
    // lone star matches everything (length 1 — less specific than any
    // literal rule, per most-octets precedence)
    assert(len("/anything", "*") == 1)
    // plain rules keep the pre-wildcard behavior bit-for-bit
    assert(len("/a/b/", "/a", "/a/b") == 4)
    assert(len("/統計/", "/統計") == 3) // character count, not bytes
    // verdict level: Allow /*.html$ outweighs Disallow /private (longest
    // rule wins), through the column API
    val df = Seq(("/private/index.html", Seq("/private"), Seq("/*.html$")),
      ("/private/data.bin", Seq("/private"), Seq("/*.html$")))
      .toDF("path", "dis", "allow")
      .withColumn("ok", RF.robots_allowed($"path", $"dis", $"allow"))
    assert(df.orderBy($"path").as[(String, Seq[String], Seq[String], Boolean)]
      .collect().map(_._4).toSeq == Seq(false, true))
  }

  test("null semantics: null on any null input; the filter drops such rows") {
    // null RULE arrays poison the HOF fold the same way (null <= x = null);
    // a null PATH is the one divergence — the HOF's two empty folds compare
    // 0 <= 0 = TRUE, the native expression stays null-intolerant (strictly
    // more conservative: the row is dropped, never admitted). politeBatch
    // never feeds a null: path is concat(url_path(url), '/') over non-null
    // frontier URLs and both rule arrays are coalesced to empty.
    val df = Seq(
      (Some("/a"), Some(Seq("/a")), None: Option[Seq[String]]),
      (Some("/a"), None: Option[Seq[String]], Some(Seq("/a"))),
      (None: Option[String], Some(Seq("/a")), Some(Seq("/a"))))
      .toDF("path", "dis", "allow")
      .withColumn("native", RF.robots_allowed($"path", $"dis", $"allow"))
      .withColumn("ref", expr(hof))
    assert(df.filter($"native".isNotNull).count() == 0)
    assert(df.filter($"path".isNotNull && $"ref".isNotNull).count() == 0)
    assert(df.filter($"path".isNull && !coalesce($"ref", lit(false))).count() == 0)
    assert(df.filter(RF.robots_allowed($"path", $"dis", $"allow")).count() == 0)
  }

  test("verdict filter stays inside WholeStageCodegen") {
    // inputs derived from range so constant folding can't collapse the
    // plan to a LocalTableScan before the filter exists
    val df = spark.range(2).select(
      concat(lit("/a/"), when($"id" === 0, lit("b")).otherwise(lit("c")),
        lit("/")).as("path"),
      array(lit("/a")).as("dis"), array(lit("/a/b")).as("allow"))
    val q = df.filter(RF.robots_allowed($"path", $"dis", $"allow"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan)
    assert(q.count() == 1)
  }

  test("SQL registration: robots_allowed callable from spark.sql") {
    RobotsFunctions.registerAll(spark)
    val n = spark.sql(
      "SELECT robots_allowed('/a/b/', array('/a'), array('/a/b')) AS ok").head().getBoolean(0)
    assert(n)
  }
}
