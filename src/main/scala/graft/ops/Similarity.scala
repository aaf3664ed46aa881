package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing as the scale path (candidate
  * generation inside a bucket instead of all-pairs), and cosine near-dup
  * pair mining. Dot products fold the vector sequentially in index order
  * in double precision — deterministic and engine-portable (bit-identical
  * to the SQL `aggregate`-over-`zip_with` fold), computed by the codegen'd
  * [[graft.functions.ArrayDot]] expression so the inner loop JITs instead
  * of interpreting two lambdas per element. Plane weights are
  * integer-derived, so bucket assignment is exactly reproducible anywhere.
  */
object Similarity {

  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.array_dot(col(a), col(b))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k neighbors of one query vector: broadcast the query, scan
    * the corpus once (the ANN baseline — O(n·d), no shuffle except top-k). */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    val q = e.filter(col(idCol) === queryId).select(col("e").as("qe"))
    e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine("e", "qe"), 6))
      .select(col(idCol), col("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Deterministic integer-derived weights of hyperplane `p` (same values
    * the SQL formulation computes per element: `(p*1000003 + d*7919) % 2001
    * - 1000`, cast to double — exactly representable). */
  private def planeWeights(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map(d => ((p.toLong * 1000003L + d.toLong * 7919L) % 2001L - 1000L).toDouble)

  /** Random-hyperplane LSH signature (`planes` bits) per vector — one
    * codegen'd dot against each plane's literal weight vector. */
  def lshSignature(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, dims: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    val sig = (0 until planes).map { p =>
      val d = graft.functions.VectorFunctions.array_dot(
        col("e"), typedLit(planeWeights(p, dims)))
      when(d > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    e.select(col(idCol), col("e"), sig.as("sig"))
  }

  /** ANN candidate pairs via LSH buckets: all-pairs only within a bucket
    * (shuffle on sig), each verified with the exact cosine.
    *
    * Ids-first: only `(sig, id)` rides the bucket shuffle — at 10^9 × 64d,
    * shipping both embedding arrays through the candidate join would move
    * two orders of magnitude more bytes than the 16-byte id rows; the
    * vectors re-attach by id to the (much smaller) candidate set only. */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, dims: Int, threshold: Double): DataFrame = {
    val s = lshSignature(emb, idCol, vecCol, planes, dims)
    val ids = s.select(col("sig"), col(idCol))
    val l = ids.select(col("sig"), col(idCol).as("v1"))
    val r = ids.select(col("sig"), col(idCol).as("v2"))
    val cand = l.join(r, Seq("sig")).filter(col("v1") < col("v2")).select("v1", "v2")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    cand
      .join(e.select(col(idCol).as("v1"), col("e").as("e1")), Seq("v1"))
      .join(e.select(col(idCol).as("v2"), col("e").as("e2")), Seq("v2"))
      .withColumn("cos", round(
        dot("e1", "e2") / (sqrt(dot("e1", "e1")) * sqrt(dot("e2", "e2"))), 6))
      .filter(col("cos") >= threshold)
      .select("v1", "v2", "cos")
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer over the corpus,
    * vectors assigned to their nearest centroid's posting list; a query
    * probes only the `nProbe` nearest lists — at 10^9 vectors the scan
    * shrinks by ~k/nProbe while recall stays high for clustered data.
    * Returns the approximate top-k by exact cosine within probed lists.
    * (KMeans seed fixed — deterministic per Spark version, but not
    * engine-portable, so this op is ScalaTest-verified by recall against
    * [[cosineTopK]] rather than oracle-hashed.)
    *
    * One-shot form: fits and scans per call. Pipelines serving repeated
    * queries use [[IvfIndex]] — the same quantizer persisted once
    * (centroids + list-partitioned assignments), probed many times with
    * partition-pruned reads and no refit. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nLists: Int = 16, nProbe: Int = 4,
      fitSample: Long = 200000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
      .withColumn("features", array_to_vector(col("e")))
    // the quantizer only needs a representative sample — at 10^9 vectors
    // fitting on the full corpus would iterate the whole table 10×; a
    // deterministic hash-sample of ~fitSample rows trains centroids of the
    // same quality (standard IVF practice), then assignment is one pass
    val nRows = e.count()
    val train =
      if (nRows <= fitSample) e
      else e.filter(pmod(xxhash64(col(idCol)), lit(nRows / fitSample)) === 0)
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10).fit(train)
    val assigned = model.transform(e).withColumnRenamed("prediction", "list")

    // nProbe centroids closest to the query vector (tiny, driver-side)
    val qVec = e.filter(col(idCol) === queryId).select("e")
      .head().getSeq[Double](0).toArray
    val probeLists = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq

    val q = e.filter(col(idCol) === queryId).select(col("e").as("qe"))
    assigned.filter(col("list").isInCollection(probeLists) && col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine("e", "qe"), 6))
      .select(col(idCol), col("cos"), col("list"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Banded (amplified) LSH near-dup pairs — [[lshNearDupPairs]] with the
    * standard AND-OR construction: `bands` independent `planes`-bit
    * signatures per vector (band b uses plane indices [b·planes,
    * (b+1)·planes) of the same deterministic family), candidates = pairs
    * agreeing on ANY band's full signature, each verified once by exact
    * cosine. One band of k planes catches a θ-angle pair with probability
    * (1−θ/π)^k — at cos 0.95 and k=16 that is ~0.18, i.e. a single band
    * MISSES most threshold-level pairs; B bands amplify to
    * 1−(1−(1−θ/π)^k)^B (k=8, B=8 → ~0.99 at cos 0.95). Precision is owned
    * by the exact-cosine verify, so extra candidates only cost compute.
    * Ids-first like the single-band form: only (band, sig, id) rides the
    * bucket shuffle; vectors re-attach to the deduplicated candidate set. */
  def lshBandedNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, bands: Int, dims: Int, threshold: Double): DataFrame = {
    require(planes >= 1 && bands >= 1,
      s"lshBandedNearDupPairs: planes=$planes bands=$bands must be >= 1")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    // ONE scan of the input: all bands' signatures are computed in a
    // single projection (an array of (band, sig) structs, exploded) — a
    // union-of-per-band-selects would re-scan the relation `bands` times
    val sigStructs = (0 until bands).map { b =>
      val sig = (0 until planes).map { p =>
        val d = graft.functions.VectorFunctions.array_dot(
          col("e"), typedLit(planeWeights(b * planes + p, dims)))
        when(d > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    val ids = e
      .select(col(idCol), explode(array(sigStructs: _*)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"), col(idCol))
    val l = ids.select(col("band"), col("sig"), col(idCol).as("v1"))
    val r = ids.select(col("band"), col("sig"), col(idCol).as("v2"))
    val cand = l.join(r, Seq("band", "sig")).filter(col("v1") < col("v2"))
      .select("v1", "v2").distinct() // a pair may collide in several bands
    cand
      .join(e.select(col(idCol).as("v1"), col("e").as("e1")), Seq("v1"))
      .join(e.select(col(idCol).as("v2"), col("e").as("e2")), Seq("v2"))
      .withColumn("cos", round(
        dot("e1", "e2") / (sqrt(dot("e1", "e1")) * sqrt(dot("e2", "e2"))), 6))
      .filter(col("cos") >= threshold)
      .select("v1", "v2", "cos")
  }

  /** SemDeDup-style semantic deduplication: embedding near-dup pairs
    * (LSH-bucketed candidates verified by exact cosine) clustered into
    * connected components, exactly one representative kept per cluster.
    * Output `(idCol, component, is_kept)` over the whole corpus — the
    * composition a training-data pipeline runs after embedding documents.
    * The exact-pair variant ([[nearDupPairs]] edges) is the bounded
    * verification baseline; this form scales because candidates come from
    * buckets, never all-pairs. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int, dims: Int, threshold: Double): DataFrame =
    graft.ops.Dedup.dedupComponents(emb, idCol,
      lshNearDupPairs(emb, idCol, vecCol, planes, dims, threshold), "v1", "v2")

  /** Exact cosine near-dup pairs (bounded input — the verification
    * baseline for [[lshNearDupPairs]]). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("e"))
    val l = e.select(col(idCol).as("v1"), col("e").as("e1"))
    val r = e.select(col(idCol).as("v2"), col("e").as("e2"))
    l.crossJoin(r).filter(col("v1") < col("v2"))
      .withColumn("cos", round(
        dot("e1", "e2") / (sqrt(dot("e1", "e1")) * sqrt(dot("e2", "e2"))), 6))
      .filter(col("cos") >= threshold)
      .select("v1", "v2", "cos")
  }
}
