package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components clustering (alternating large-star/small-star) vs an
  * in-test union-find oracle, on graph shapes chosen to break weak
  * implementations: long chains (diameter ≫ log n — where naive min-label
  * propagation stalls), random graphs, planted cliques with isolated
  * vertices, and degenerate pair inputs (duplicates, reversed orientation,
  * self-loops, empty).
  */
class DedupComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Union-find oracle: component = min id reachable. */
  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress everything, then label by root min (roots are minima
    // because unions always point the larger root at the smaller)
    n.map(v => v -> find(v)).toMap
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("long chain: one component rooted at the minimum (log-round convergence)") {
    // 0-1-2-...-299: diameter 299; star rounds must converge well under the
    // 64-iteration guard (naive propagation would need 299 rounds)
    val pairs = (0L until 299L).map(i => (i, i + 1))
    val got = run(pairs)
    assert(got.size == 300)
    assert(got.values.forall(_ == 0L))
  }

  test("random graph equals union-find") {
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 400L)
    val pairs = Seq.fill(300)((rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(pairs.flatMap(p => Seq(p._1, p._2)).distinct, pairs)
    assert(run(pairs) == expected)
  }

  test("reversed, duplicated, and self pairs are harmless") {
    val pairs = Seq((5L, 2L), (2L, 5L), (5L, 2L), (3L, 3L), (2L, 9L))
    val got = run(pairs)
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L, 3L -> 3L))
  }

  test("empty pair relation yields empty components") {
    assert(run(Seq.empty) == Map.empty)
  }

  test("non-convergence within maxIterations fails loudly, never silently partial") {
    assertThrows[IllegalArgumentException] {
      Dedup.connectedComponents(Seq((1L, 2L)).toDF("d1", "d2"), maxIterations = 0)
    }
  }

  test("incremental jaccard == batch jaccard restricted to delta-touching pairs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (corpus, delta) = (docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
    for (maxDf <- Seq(Long.MaxValue, 8L)) {
      val inc = Dedup.jaccardPairsIncremental(corpus, delta, "doc_id", "text",
        threshold = 0.1, maxDf = maxDf, ngram = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val batch = Dedup.jaccardPairs(docs, "doc_id", "text",
        threshold = 0.1, maxDf = maxDf, ngram = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        .filter(p => p._1 < 20 || p._2 < 20)
      assert(inc == batch, s"maxDf=$maxDf: ${inc.size} vs ${batch.size}")
      assert(inc.nonEmpty, "fixture produced no delta-touching pairs")
    }
  }

  test("incremental minhash candidates == batch candidates touching the delta") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (corpus, delta) = (docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20))
    for (cap <- Seq(Long.MaxValue, 12L)) {
      val inc = Dedup.minhashCandidatePairsIncremental(corpus, delta,
        "doc_id", "text", maxBandPopulation = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        maxBandPopulation = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        .filter(p => p._1 < 20 || p._2 < 20)
      assert(inc == batch, s"cap=$cap: ${inc.size} vs ${batch.size}")
    }
  }

  test("dedupComponents: planted cliques collapse, isolated docs keep themselves") {
    val corpus = (0L until 30L).toDF("doc_id")
    // cliques {1,4,7}, {10,20}, chain 21-22-23; rest isolated
    val pairs = Seq((4L, 1L), (7L, 4L), (1L, 7L), (20L, 10L), (21L, 22L), (22L, 23L))
      .toDF("d1", "d2")
    val got = Dedup.dedupComponents(corpus, "doc_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList.sortBy(_._1)
    val comp = got.map(t => t._1 -> t._2).toMap
    assert(comp(1L) == 1L && comp(4L) == 1L && comp(7L) == 1L)
    assert(comp(10L) == 10L && comp(20L) == 10L)
    assert(comp(21L) == 21L && comp(22L) == 21L && comp(23L) == 21L)
    // isolated: own component
    assert((0L until 30L).filterNot(Set(1L, 4L, 7L, 10L, 20L, 21L, 22L, 23L))
      .forall(i => comp(i) == i))
    // exactly one kept per component, and it is the minimum
    val kept = got.filter(_._3 == 1).map(_._1).toSet
    assert(got.forall { case (id, c, k) => (k == 1) == (id == c) })
    assert(kept.size == got.map(_._2).distinct.size)
  }

  test("incremental clustering: delta pairs fold into existing labels; merges, never splits") {
    // epoch 1: clusters {1,2,3} and {10,11}, plus the standing SINGLETON
    // label (20, 20) — a doc in no pair, whose self-label must survive the
    // fold untouched (it rides in as a self-loop edge)
    val epoch1 = run(Seq((1L, 2L), (2L, 3L), (10L, 11L))) + (20L -> 20L)
    val labels = epoch1.toSeq.toDF("id", "component")
    // epoch 2 delta: new doc 50 bridges the two clusters; 60-61 a new pair
    val merged = Dedup.connectedComponentsIncremental(labels,
      Seq((3L, 50L), (50L, 11L), (60L, 61L)).toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = unionFind(Seq(1L, 2L, 3L, 10L, 11L, 20L, 50L, 60L, 61L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 50L), (50L, 11L), (60L, 61L)))
    assert(merged == expected)
    assert(Seq(1L, 2L, 3L, 10L, 11L, 50L).forall(merged(_) == 1L)) // merged via 50
    assert(merged(60L) == 60L && merged(61L) == 60L)
    assert(merged(20L) == 20L, "standing singleton label lost in the fold")
  }

  test("two disjoint cliques stay separate") {
    val a = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val b = for (i <- 200L to 204L; j <- (i + 1) to 204L) yield (i, j)
    val got = run(a ++ b)
    assert((100L to 104L).forall(got(_) == 100L))
    assert((200L to 204L).forall(got(_) == 200L))
  }

  test("canonicalByQuality: argmax per component, tie → min id, missing quality → worst, singleton keeps itself") {
    val corpus = (1L to 9L).toDF("id")
    // components: {1,2,3} (bridge through 2), {4,5}, {6,7}, singletons 8, 9
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L)).toDF("d1", "d2")
    // quality: best in {1,2,3} is 3; {4,5} ties → min id 4 wins;
    // {6,7}: 6 has NO quality row (worst) → 7 wins; 8 singleton with
    // quality, 9 singleton without — both keep themselves
    val quality = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 7.0),
      (5L, 7.0), (7L, 1.0), (8L, 5.0)).toDF("id", "q")
    val got = Dedup.canonicalByQuality(corpus, "id", pairs, quality, "q")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == Map(
      1L -> ((1L, 0)), 2L -> ((1L, 0)), 3L -> ((1L, 1)),
      4L -> ((4L, 1)), 5L -> ((4L, 0)),
      6L -> ((6L, 0)), 7L -> ((6L, 1)),
      8L -> ((8L, 1)), 9L -> ((9L, 1))))
  }
}
