package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[Multimodal.captionCap]] — the salted two-phase kept set must be
  * BIT-IDENTICAL to the obvious global per-caption window's, on exactly
  * the input that breaks the obvious construction: one boilerplate
  * caption carrying an order of magnitude more rows than every other.
  * The reference here is an in-test brute force; the q64 oracle repeats
  * the same check against DuckDB's window.
  */
class CaptionCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], cap: Int)
      : Map[Long, (String, Long, Boolean)] = {
    val freq = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val kept = rows.groupBy(_._2).flatMap { case (_, rs) =>
      rs.map(_._1).sorted.take(cap)
    }.toSet
    rows.map { case (id, c) => id -> (c, freq(c), kept(id)) }.toMap
  }

  private def run(rows: Seq[(Long, String)], cap: Int, saltBuckets: Int)
      : Map[Long, (String, Long, Boolean)] =
    Multimodal.captionCap(rows.toDF("id", "caption"), "id", "caption",
        cap, saltBuckets)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap

  test("hot boilerplate caption: salted kept set equals the global window's") {
    // 400 rows of one caption, ~10 rows each of 20 others, shuffled ids
    val rows = ((0L until 400L).map(i => (i * 7 % 1000, "stock photo")) ++
      (0L until 200L).map(i => (2000 + i, s"caption ${i % 20}")))
      .distinctBy(_._1)
    for (saltBuckets <- Seq(1, 4, 64)) {
      assert(run(rows, cap = 3, saltBuckets) == brute(rows, 3),
        s"saltBuckets=$saltBuckets")
    }
  }

  test("cap larger than any group keeps everything; cap=1 keeps minima") {
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "b"), (9L, "a"))
    val all = run(rows, cap = 10, saltBuckets = 4)
    assert(all.values.forall(_._3))
    val one = run(rows, cap = 1, saltBuckets = 4)
    assert(one(1L)._3 && !one(2L)._3 && !one(9L)._3 && one(3L)._3)
    assert(one(1L)._2 == 3L && one(3L)._2 == 1L) // frequencies
    intercept[IllegalArgumentException] {
      Multimodal.captionCap(rows.toDF("id", "caption"), "id", "caption", 0)
    }
  }

  test("extra payload columns ride through unchanged") {
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"))
      .toDF("id", "caption", "payload")
    val out = Multimodal.captionCap(df, "id", "caption", cap = 1)
      .select("id", "payload", "kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(out == Set((1L, "x", true), (2L, "y", false), (3L, "z", true)))
  }
}
