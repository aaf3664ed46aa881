package graft.ops

import graft.functions.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** IVFADC: recall through the probe → residual-ADC → exact-rerank path,
  * partition pruning of probed posting lists (inputFiles), determinism
  * under repartitioning, the unencodable gate, and the stale-handle /
  * maintain lifecycle shared with PqIndex. */
class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val centers = Array.fill(6)(Array.fill(16)(rnd.nextDouble() * 20 - 10))
  private def clustered(n: Int, seed: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(_ + r.nextGaussian() * 0.3).toSeq)
    }
  }

  test("recall: probe + residual ADC + rerank matches exact cosine top-k") {
    val corpus = clustered(180, 23).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-recall-").toString
    val (idx, excluded) = IvfPqIndex.build(spark, dir, corpus,
      "vec_id", "embedding", nLists = 6, m = 4, k = 16)
    assert(excluded == 0L)
    val q = centers(4)
    def cos(v: Seq[Double]): Double = {
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
    }
    val all = clustered(180, 23)
    val exact = all.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = idx.topKRerank(q, 10, corpus, "vec_id", "embedding", nProbe = 3)
      .select("id").as[Long].collect().toSet
    assert((exact & got).size >= 9, s"recall ${(exact & got).size}/10")
    // all results come from the query's own cluster's probed lists
    assert(got.forall(id => cos(all.find(_._1 == id).get._2) > 0.9))
  }

  test("probes are partition-pruned scans (inputFiles)") {
    val corpus = clustered(180, 29).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-prune-").toString
    val (idx, _) = IvfPqIndex.build(spark, dir, corpus,
      "vec_id", "embedding", nLists = 6, m = 4, k = 16)
    val allFiles = idx.codes.inputFiles.toSet
    val probed = idx.probeLists(centers(1), 2)
    val probedFiles = probed.flatMap(l => idx.probeScan(l).inputFiles).toSet
    assert(probedFiles.nonEmpty && probedFiles.subsetOf(allFiles))
    assert(probedFiles.size < allFiles.size,
      s"probe read ${probedFiles.size}/${allFiles.size} files — nothing pruned")
    assert(probedFiles.forall(f => probed.exists(l => f.contains(s"list=$l"))))
  }

  test("serving is deterministic; a same-input rebuild reproduces the index") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-det-").toString
    val corpus = clustered(180, 31).toDF("vec_id", "embedding")
    val (idx, _) = IvfPqIndex.build(spark, dir, corpus,
      "vec_id", "embedding", nLists = 6, m = 4, k = 16)
    val base = idx.topK(centers(0), 8, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // repeated queries of the same index are bit-identical
    assert(idx.topK(centers(0), 8, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == base)
    // rebuilding from the SAME relation reproduces the same results
    // (fits are seeded; cross-PARTITIONING fit determinism is not claimed
    // — kmeans|| init samples per partition, the IvfIndex caveat)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq-det2-").toString
    val (idx2, _) = IvfPqIndex.build(spark, dir2, corpus,
      "vec_id", "embedding", nLists = 6, m = 4, k = 16)
    assert(idx2.topK(centers(0), 8, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == base)
  }

  test("unencodable vectors gate out counted; append + stale handle + maintain") {
    val good = clustered(120, 37)
    val bad = Seq(
      (900L, Seq(1.0, 2.0)),                   // wrong length
      (901L, null.asInstanceOf[Seq[Double]]))  // null
    val corpus = (good ++ bad).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-life-").toString
    val (idx, excluded) = IvfPqIndex.build(spark, dir, corpus,
      "vec_id", "embedding", nLists = 6, m = 4, k = 16)
    assert(excluded == 2L && idx.rows == 120L)

    val delta = clustered(80, 41).map { case (id, v) => (id + 1000L, v) }
      .toDF("vec_id", "embedding")
    assert(idx.append(delta, "vec_id", "embedding") == 0L)
    assert((idx.rows, idx.builtRows) == ((200L, 120L)) && idx.needsRebuild(0.5))
    // an appended vector is served through the probes
    val probe = clustered(80, 41).head._2.toArray.map(identity)
    val near = idx.topK(probe, 5, nProbe = 3)
      .select("id").as[Long].collect()
    assert(near.contains(1000L), near.mkString(","))

    val lake = corpus.unionByName(delta)
    assert(IvfPqIndex.maintain(spark, dir, lake, "vec_id", "embedding", 0.5))
    val fresh = IvfPqIndex.load(spark, dir)
    assert(fresh.gen.contains(0))
    assert((fresh.rows, fresh.builtRows) == ((200L, 200L)) && !fresh.needsRebuild(0.5))
    assert(!IvfPqIndex.maintain(spark, dir, lake, "vec_id", "embedding", 0.5))
    val e = intercept[IllegalStateException](idx.append(delta, "vec_id", "embedding"))
    assert(e.getMessage.contains("stale handle"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "codes")))
  }
}
