package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Fixed-point integer PageRank vs an in-test reference implementation
  * (plain Scala loops), plus the determinism property the integer design
  * exists for: identical output under different partitionings. */
class LinkRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: same fixed-point recurrence, sequential. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(t => t._1 != t._2).distinct
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      e.foreach { case (s, d) => contrib(d) += rank(s) / outdeg(s) }
      rank = nodes.map(v => v -> (150000L + 850000L * contrib(v) / 1000000L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], parts: Int): Map[Long, Long] =
    LinkRank.pageRank(edges.toDF("src", "dst").repartition(parts), "src", "dst",
      iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graph equals the sequential reference exactly") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(400)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    assert(run(edges, 8) == reference(edges, 5))
  }

  test("star graph: the hub outranks every leaf") {
    val edges = (1L to 20L).flatMap(i => Seq((i, 0L), (0L, i)))
    val got = run(edges, 4)
    assert(got == reference(edges, 5))
    assert((1L to 20L).forall(i => got(0L) > got(i)))
  }

  test("bit-identical across partitionings (the integer-arithmetic guarantee)") {
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(600)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
    assert(run(edges, 1) == run(edges, 17))
  }

  test("duplicate and self edges are ignored") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 1L))
    assert(run(edges, 2) == reference(edges, 5))
  }

  test("hostRank: hub host gets priority 1; same-host links are not authority") {
    // h1..h5 each cite hub h0; h1 also cites h2; heavy SELF-linking on h3
    // must not inflate h3 (intra-host edges dropped — h3 keeps only its
    // outbound citation of the hub, so it has zero incoming authority)
    val links = ((1 to 5).map(i => (s"http://h$i.com/a", "http://h0.com/x")) ++
      Seq(("http://h1.com/b", "http://h2.com/y")) ++
      (1 to 50).map(i => (s"http://h3.com/p$i", s"http://h3.com/p${i + 1}")))
      .toDF("src", "dst")
    val got = LinkRank.hostRank(links, "src", "dst")
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got("h0.com")._1 == 1, s"hub not first: $got")
    assert(got("h0.com")._2 > got("h2.com")._2)
    assert(got("h2.com")._2 > got("h3.com")._2,
      s"self-linking host outranked a cited host: $got")
    // the table is directly consumable by the crawler: (host, priority)
    assert(got.values.map(_._1).toSeq.sorted == (1 to got.size).toSeq)
  }

  test("denseRank is distributed: multi-partition layout kept, no Window") {
    val in = (0 until 4000).map(i => (s"h$i.com", (i % 97).toLong))
    val df = in.toDF("host", "rank").repartition(8)
    val got = LinkRank.denseRank(df)
    // the rank is computed in a range-partitioned sortBy + zipWithIndex —
    // partition layout survives (a global window would collapse to ONE)
    assert(got.rdd.getNumPartitions == 8,
      s"rank sort collapsed partitions: ${got.rdd.getNumPartitions}")
    // and no Window/single-partition Exchange exists in the SQL plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"), plan)
    val expect = in.sortBy { case (h, r) => (-r, h) }.zipWithIndex
      .map { case ((h, r), i) => (h, i + 1, r) }.toSet
    assert(got.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2))).toSet == expect)
  }

  test("hostRank plan carries no Window operator (the r3 single-task sort)") {
    val links = (0 until 200).map(i =>
      (s"http://h$i.com/a", s"http://h${(i + 1) % 200}.com/b")).toDF("src", "dst")
    val got = LinkRank.hostRank(links, "src", "dst", iterations = 2)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    // ring graph: every host cited once → equal rank, tie-break by host name
    val rows = got.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val byName = rows.sortBy(r => (-r._3, r._1)).map(_._2)
    assert(byName.toSeq == (1 to 200).toSeq)
  }
}
