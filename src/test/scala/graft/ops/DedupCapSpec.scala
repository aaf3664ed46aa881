package graft.ops

import graft.functions.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.math.BigDecimal.RoundingMode

/** Skew caps for the pair generators: a hot token (stopword) or hot LSH band
  * emits O(n²) pairs within its posting list/bucket — the caps bound that
  * blowup at 100 TB. Capped results are re-derived independently in Scala
  * set math on the collected corpus (tiny bounded slices).
  */
class DedupCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docSets(maxId: Long): Map[Long, Set[String]] =
    spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < maxId)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap

  test("jaccardPairs maxDf: equals set-math recompute on the reduced token universe") {
    val maxDf = 20L
    val sets = docSets(40)
    val dfreq = sets.values.flatten.groupBy(identity).map { case (t, ts) => t -> ts.size }
    val keep = dfreq.collect { case (t, n) if n <= maxDf => t }.toSet
    val reduced = sets.view.mapValues(_.intersect(keep)).toMap
    val expected = (for {
      (d1, s1) <- reduced; (d2, s2) <- reduced if d1 < d2
      inter = s1.intersect(s2).size if inter > 0
      j = BigDecimal(inter.toDouble / (s1.size + s2.size - inter))
        .setScale(6, RoundingMode.HALF_UP).toDouble if j >= 0.2
    } yield (d1, d2, j)).toSet

    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 40)
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.2, maxDf = maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)

    // the audit relation is exactly the complement of the kept universe
    val dropped = Dedup.hotTokens(docs, "doc_id", "text", maxDf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped.keySet == dfreq.collect { case (t, n) if n > maxDf => t }.toSet)
    dropped.foreach { case (t, n) => assert(n == dfreq(t).toLong) }
  }

  test("jaccardPairs ngram: bigram shingles equal set-math recompute") {
    val sets = docSets(40)
    val grams = sets.keys.map { d =>
      val toks = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") === d).select("text").collect()(0).getString(0).split(" ")
      d -> toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    }.toMap
    val expected = (for {
      (d1, s1) <- grams; (d2, s2) <- grams if d1 < d2
      inter = s1.intersect(s2).size if inter > 0
      j = BigDecimal(inter.toDouble / (s1.size + s2.size - inter))
        .setScale(6, RoundingMode.HALF_UP).toDouble if j >= 0.02
    } yield (d1, d2, j)).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 40)
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.02, ngram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")
  }

  test("hotTokens(ngram=2): audit shares the bigram universe with the capped pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").filter(col("doc_id") < 40)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val grams = texts.view.mapValues(
      toks => toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet).toMap
    val bigramDf = grams.values.flatten.groupBy(identity).map { case (g, gs) => g -> gs.size }
    val maxDf = 3L

    // the audit relation == the over-cap BIGRAM frequencies, exactly
    val dropped = Dedup.hotTokens(docs, "doc_id", "text", maxDf, ngram = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dropped.keySet == bigramDf.collect { case (g, n) if n > maxDf => g }.toSet)
    dropped.foreach { case (g, n) => assert(n == bigramDf(g).toLong) }
    assert(dropped.nonEmpty, "fixture has no hot bigrams — lower maxDf")

    // and it corresponds to what jaccardPairs(ngram=2, maxDf) actually drops:
    // set-math recompute over the REDUCED bigram universe
    val keep = bigramDf.collect { case (g, n) if n <= maxDf => g }.toSet
    val reduced = grams.view.mapValues(_.intersect(keep)).toMap
    val expected = (for {
      (d1, s1) <- reduced; (d2, s2) <- reduced if d1 < d2
      inter = s1.intersect(s2).size if inter > 0
      j = BigDecimal(inter.toDouble / (s1.size + s2.size - inter))
        .setScale(6, RoundingMode.HALF_UP).toDouble if j >= 0.02
    } yield (d1, d2, j)).toSet
    val got = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.02,
      maxDf = maxDf, ngram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")

    // regression guard on the round-2 defect: the bigram audit is NOT the
    // unigram audit
    val unigramDropped = Dedup.hotTokens(docs, "doc_id", "text", maxDf)
      .collect().map(r => r.getString(0)).toSet
    assert(dropped.keySet != unigramDropped)
  }

  test("simhashNearDup: pigeonhole bucketing finds EXACTLY the ≤r-hamming pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = 3
    val expected = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= r
    } yield (d1, d2, h)).toSet
    val got = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = r)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(got == expected, s"${got.size} vs ${expected.size}")
    assert(got.nonEmpty)
    // the block-population skew cap only ever removes pairs
    val capped = Dedup.simhashNearDup(docs, "doc_id", "text", maxHamming = r,
      maxBlockPopulation = 5L)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(capped.subsetOf(got) && capped.size < got.size)
  }

  test("minhash band cap: pairs equal recompute from capped buckets; capped ⊆ uncapped") {
    val cap = 5L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bands = Dedup.bandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val pop = bands.groupBy(_._2).view.mapValues(_.size).toMap
    val keptBands = bands.filter(b => pop(b._2) <= cap)
    val expected = keptBands.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).distinct.toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet

    val got = Dedup.minhashCandidatePairs(docs, "doc_id", "text", maxBandPopulation = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)

    val uncapped = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(uncapped))
    assert(got.nonEmpty, "cap dropped every bucket — pick a larger cap for the fixture")
    // the audit relation lists exactly the dropped buckets
    val hot = Dedup.hotBands(docs, "doc_id", "text", cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hot.keySet == pop.collect { case (b, n) if n > cap => b }.toSet)
  }
}
