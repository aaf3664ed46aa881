package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.leakageSafeSplit]] — the property that matters is structural:
  * no duplicate component may EVER straddle a split boundary, under any
  * graph shape, because a straddling near-dup pair turns held-out eval
  * into a memorization test. Checked against an in-test replay of the
  * md5 bucket arithmetic (the same replay the q63 DuckDB oracle does),
  * plus the growth-stability contract: appending rows that do not merge
  * components cannot move any existing component's split.
  */
class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val splits3 = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Replay of the operator's bucket arithmetic: md5("salt:comp") first
    * 15 hex digits as int64, mod 10000, against cumulative thresholds. */
  private def expectedSplit(comp: Long, salt: String = "split",
      splits: Seq[(String, Double)] = splits3): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$salt:$comp".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    val b = java.lang.Long.parseLong(hex, 16) % 10000L
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    splits.zip(cum).collectFirst {
      case ((name, _), t) if b < math.round(t * 10000) => name
    }.getOrElse(splits.last._1)
  }

  private def run(ids: Seq[Long], edges: Seq[(Long, Long)],
      splits: Seq[(String, Double)] = splits3): Map[Long, (Long, String)] =
    Dedup.leakageSafeSplit(ids.toDF("id"), "id", edges.toDF("d1", "d2"), splits)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("no component straddles a split; buckets match the md5 replay") {
    val ids = (0L until 200L)
    // planted clusters of 5 + a long chain + singletons
    val edges = ids.filter(i => i % 10 < 4).map(i => (i, i + 1)) ++
      (100L until 120L).map(i => (i, i + 1))
    val out = run(ids, edges)
    assert(out.size == 200)
    // members of one component agree on the split
    out.groupBy(_._2._1).foreach { case (_, members) =>
      assert(members.values.map(_._2).toSet.size == 1)
    }
    // and the split is exactly the md5 bucket replay of the component
    out.foreach { case (_, (comp, split)) =>
      assert(split == expectedSplit(comp), s"component $comp")
    }
    // with 3 named splits over ~100 components, all three appear
    assert(out.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("appending non-merging rows never moves an existing component") {
    val ids = (0L until 60L)
    val edges = (0L until 30L by 3).map(i => (i, i + 1))
    val before = run(ids, edges)
    // growth: new singletons + a new member attached to component 0
    val grown = run(ids ++ (60L until 80L), edges :+ (0L -> 61L))
    before.foreach { case (id, (comp, split)) =>
      if (id != 61L) {
        assert(grown(id)._1 == comp, s"id $id component moved")
        assert(grown(id)._2 == split, s"id $id split moved")
      }
    }
    // the attached row inherits component 0's split
    assert(grown(61L)._1 == 0L && grown(61L)._2 == before(0L)._2)
  }

  test("merging two components re-keys to the surviving label") {
    val ids = Seq(1L, 2L, 10L, 11L)
    val before = run(ids, Seq((1L, 2L), (10L, 11L)))
    assert(before(1L)._1 == 1L && before(10L)._1 == 10L)
    val merged = run(ids, Seq((1L, 2L), (10L, 11L), (2L, 10L)))
    // all four now share component 1 and therefore component 1's split
    merged.values.foreach { case (comp, split) =>
      assert(comp == 1L && split == expectedSplit(1L))
    }
  }

  test("degenerate splits: single name takes everything; bad weights rejected") {
    val all = run(Seq(1L, 2L, 3L), Seq((1L, 2L)), Seq("all" -> 1.0))
    assert(all.values.forall(_._2 == "all"))
    intercept[IllegalArgumentException] {
      Dedup.leakageSafeSplit(Seq(1L).toDF("id"),
        "id", Seq.empty[(Long, Long)].toDF("d1", "d2"), Seq("a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Dedup.leakageSafeSplit(Seq(1L).toDF("id"),
        "id", Seq.empty[(Long, Long)].toDF("d1", "d2"), Seq.empty)
    }
  }
}
