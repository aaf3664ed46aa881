package graft.ops

import graft.functions.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: exactness on a codebook-representable corpus
  * (ADC ≡ exact squared L2 when every vector IS a centroid tuple), recall
  * on clustered data via the ADC→exact-cosine rerank, the unencodable-row
  * gate, persistence + append drift accounting, and the map-only codegen
  * shape of the encode/score projections. */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 8-dim corpus, m=2 subspaces of 4 dims, 4 well-separated values per
  // subspace → every vector is exactly representable by a fitted codebook
  private val subVals: Array[Array[Double]] = Array(
    Array(0.0, 0.0, 0.0, 0.0), Array(10.0, 0.0, 0.0, 0.0),
    Array(0.0, 10.0, 5.0, 0.0), Array(-10.0, 0.0, 0.0, 7.0))
  private def vecFor(id: Long): Seq[Double] =
    (subVals((id % 4).toInt) ++ subVals(((id / 4) % 4).toInt)).toSeq
  private def representable = (0L until 64L).map(id => (id, vecFor(id)))
    .toDF("vec_id", "embedding")

  test("exactness: a codebook-representable corpus round-trips, ADC = exact L2") {
    val dir = java.nio.file.Files.createTempDirectory("pq-exact-").toString
    val (idx, excluded) = PqIndex.build(spark, dir, representable,
      "vec_id", "embedding", m = 2, k = 4)
    assert(excluded == 0L)
    val cb = idx.codebook
    assert((cb.m, cb.k, cb.dsub) == ((2, 4, 4)))
    // decode(encode(v)) == v for every corpus vector: the fitted centroids
    // ARE the 4 planted subspace values (their cluster means)
    representable.collect().foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val codes = graft.functions.VectorKernels.pqEncode(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v), cb.centroids)
      assert(java.util.Arrays.equals(cb.decode(codes), v), s"id ${r.getLong(0)}")
    }
    // therefore ADC top-k ≡ brute-force squared-L2 top-k
    val q = vecFor(13L).toArray
    val got = idx.topK(q, 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = (0L until 64L).map { id =>
      val v = vecFor(id)
      (id, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.take(5)
    assert(got.map(_._1).toSeq == expected.map(_._1))
    got.zip(expected).foreach { case ((_, a), (_, e)) => assert(math.abs(a - e) < 1e-9) }
  }

  test("recall on clustered data: rerank top-k matches exact cosine top-k") {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(6)(Array.fill(16)(rnd.nextDouble() * 20 - 10))
    val corpus = (0 until 120).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.3).toSeq)
    }.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-recall-").toString
    val (idx, _) = PqIndex.build(spark, dir, corpus, "vec_id", "embedding",
      m = 4, k = 8)
    val q = centers(2)
    def cos(v: Seq[Double]): Double = {
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x * x).sum)
      val nb = math.sqrt(q.map(x => x * x).sum)
      dot / (na * nb)
    }
    val all = corpus.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val exact = all.map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val got = idx.topKRerank(q, 10, corpus, "vec_id", "embedding")
      .select("id").as[Long].collect().toSet
    val overlap = (exact & got).size
    assert(overlap >= 9, s"recall $overlap/10 (exact $exact, got $got)")
    // rerank scores are EXACT cosines (round-6), not ADC approximations
    val rr = idx.topKRerank(q, 1, corpus, "vec_id", "embedding").head()
    val expScore = BigDecimal(cos(all.find(_._1 == rr.getLong(0)).get._2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rr.getDouble(1) - expScore) <= 1e-6,
      s"${rr.getDouble(1)} vs $expScore")
  }

  test("unencodable vectors gate out with a count, never mis-index") {
    val bad = Seq(
      (100L, Seq(1.0, 2.0, 3.0)),              // wrong length
      (101L, null.asInstanceOf[Seq[Double]]))  // null vector
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-bad-").toString
    val (idx, excluded) = PqIndex.build(spark, dir,
      representable.unionByName(bad), "vec_id", "embedding", m = 2, k = 4)
    assert(excluded == 2L)
    assert(idx.rows == 64L)
    assert(idx.codes.filter($"id" >= 100L).count() == 0)
  }

  test("persistence + append: frozen codebook, drift accounting, retrievable delta") {
    val dir = java.nio.file.Files.createTempDirectory("pq-persist-").toString
    val (built, _) = PqIndex.build(spark, dir, representable,
      "vec_id", "embedding", m = 2, k = 4)
    val idx = PqIndex.load(spark, dir)
    assert(idx.codebook.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      built.codebook.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    assert((idx.rows, idx.builtRows) == ((64L, 64L)) && !idx.needsRebuild())

    val delta = (200L until 240L).map(id => (id, vecFor(id))).toDF("vec_id", "embedding")
    val excluded = idx.append(delta, "vec_id", "embedding")
    assert(excluded == 0L)
    assert((idx.rows, idx.builtRows) == ((104L, 64L)))
    assert(idx.appendedFraction > 0.5 && idx.needsRebuild(0.5))
    // an appended exact twin of the query ranks at distance 0 — behind
    // its four base-corpus twins (ids 9/25/41/57 share the same code
    // tuple; ties order by id), ahead of everything else
    val got = idx.topK(vecFor(201L).toArray, 7).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(9L, 25L, 41L, 57L, 201L, 217L, 233L),
      got.mkString(","))
    assert(got.forall(_.getDouble(1) == 0.0))
  }

  test("rerank works when the caller's id column is literally named 'id'") {
    val corpus = (0L until 64L).map(id => (id, vecFor(id))).toDF("id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-idname-").toString
    val (idx, _) = PqIndex.build(spark, dir, corpus, "id", "embedding", m = 2, k = 4)
    val got = idx.topKRerank(vecFor(9L).toArray, 4, corpus, "id", "embedding")
      .select("id").as[Long].collect().toSet
    // the query's exact twins (id % 16 == 9) dominate the cosine ranking
    assert(got.contains(9L) && got.contains(25L), got.toString)
  }

  test("low-cardinality subspace: fewer centers than k survive fit, persist and serve") {
    // second subspace is CONSTANT — KMeans may return < k centers there;
    // the codebook must stay ragged-safe through encode, ADC and reload
    val corpus = (0L until 48L)
      .map(id => (id, (subVals((id % 4).toInt) ++ subVals(0)).toSeq))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq-ragged-").toString
    val (idx, excluded) = PqIndex.build(spark, dir, corpus,
      "vec_id", "embedding", m = 2, k = 4)
    assert(excluded == 0L)
    val reloaded = PqIndex.load(spark, dir)
    for (cb <- Seq(idx.codebook, reloaded.codebook)) {
      assert(cb.centroids(0).length >= 1 && cb.centroids(0).length <= 4)
      assert(cb.centroids(1).length >= 1 && cb.centroids(1).length <= 4)
      assert(cb.centroids.forall(_.forall(_ != null)))
    }
    // still exact on this representable corpus: twins of the query at 0
    val got = reloaded.topK(vecFor(2L).toArray.take(4) ++ subVals(0), 3).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 6L, 10L), got.mkString(","))
    assert(got.forall(_.getDouble(1) == 0.0))
  }

  test("a handle loaded before a rebuild refuses to append") {
    val dir = java.nio.file.Files.createTempDirectory("pq-stale-").toString
    val (stale, _) = PqIndex.build(spark, dir, representable,
      "vec_id", "embedding", m = 2, k = 4)
    val delta = (200L until 240L).map(id => (id, vecFor(id))).toDF("vec_id", "embedding")
    stale.append(delta, "vec_id", "embedding")
    PqIndex.maintain(spark, dir, representable.unionByName(delta),
      "vec_id", "embedding", 0.5)
    val e = intercept[IllegalStateException](
      stale.append(delta, "vec_id", "embedding"))
    assert(e.getMessage.contains("stale handle"))
    // a fresh handle appends fine
    val fresh = PqIndex.load(spark, dir)
    assert(fresh.append(
      Seq((900L, vecFor(1L))).toDF("vec_id", "embedding"),
      "vec_id", "embedding") == 0L)
  }

  test("maintain: drift past threshold refits from the lake corpus behind a gen pointer") {
    val dir = java.nio.file.Files.createTempDirectory("pq-maintain-").toString
    val (idx, _) = PqIndex.build(spark, dir, representable,
      "vec_id", "embedding", m = 2, k = 4)
    val delta = (200L until 240L).map(id => (id, vecFor(id))).toDF("vec_id", "embedding")
    idx.append(delta, "vec_id", "embedding")
    assert(idx.needsRebuild(0.5))
    val corpus = representable.unionByName(delta) // the authoritative lake relation
    assert(PqIndex.maintain(spark, dir, corpus, "vec_id", "embedding", 0.5))
    val idx2 = PqIndex.load(spark, dir)
    assert(idx2.gen.contains(0))
    assert((idx2.rows, idx2.builtRows) == ((104L, 104L)) && !idx2.needsRebuild(0.5))
    // a second maintain below threshold is a no-op
    assert(!PqIndex.maintain(spark, dir, corpus, "vec_id", "embedding", 0.5))
    // the rebuilt index still resolves exact twins at distance 0
    val got = idx2.topK(vecFor(201L).toArray, 7).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(9L, 25L, 41L, 57L, 201L, 217L, 233L))
    assert(got.forall(_.getDouble(1) == 0.0))
    // the superseded root-level layout was reclaimed after the flip
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "codes")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "codebook")))
  }

  test("encode and ADC stay map-only inside WholeStageCodegen") {
    val dir = java.nio.file.Files.createTempDirectory("pq-plan-").toString
    val (idx, _) = PqIndex.build(spark, dir, representable,
      "vec_id", "embedding", m = 2, k = 4)
    // parquet-backed input: a local relation would constant-fold the
    // projection away and leave nothing to assert
    val vecDir = java.nio.file.Files.createTempDirectory("pq-plan-vec-").toString
    representable.write.mode("overwrite").parquet(vecDir)
    val enc = spark.read.parquet(vecDir).select(
      idx.codebook.encodeCol($"embedding").as("codes"))
    val encPlan = enc.queryExecution.executedPlan.toString
    assert(encPlan.contains("*(1) Project"), encPlan)
    assert(encPlan.contains("pq_encode"), encPlan)
    val scoredPlan = idx.codes
      .withColumn("adc", idx.codebook.adcCol($"codes", vecFor(0L).toArray))
      .queryExecution.executedPlan.toString
    assert(scoredPlan.contains("*(1) Project"), scoredPlan)
    assert(scoredPlan.contains("pq_adc"), scoredPlan)
    assert(!scoredPlan.contains("Exchange"), scoredPlan) // map-only scan
  }
}
