package graft.ops

import java.util.Properties

import graft.io.StateFs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each d-dim vector into `m` subvectors,
  * vector-quantize each subspace against its own `k ≤ 256`-centroid
  * codebook, and store the vector as `m` BYTES. Search is asymmetric
  * distance computation (ADC): the query precomputes an m×k table of
  * exact subspace distances once, and every encoded vector scores as m
  * table lookups — no float vector is ever read.
  *
  * This is the memory story the float index cannot tell at 100 TB: a
  * 768-dim float32 corpus is ~3 KB/vector; PQ with m=16 is 16 bytes —
  * a ~200× compression that turns a petabyte-scale embedding sweep into
  * a scan of a table that fits in cluster page cache. The engine keeps
  * the raw vectors in the lake (they are NOT copied into the index);
  * [[PqIndex#topKRerank]] re-attaches them by id equi-join for the
  * shortlist only — the LSH→verified-cosine / phash→PSNR discipline
  * applied to ANN serving.
  *
  * Scale shape: fit is m driver-coordinated KMeans runs over a bounded
  * hash-sample (the [[IvfIndex]] sampling rationale); encode is a
  * map-only codegen'd projection ([[graft.functions.PqEncode]], codebook
  * plan-embedded); ADC top-k is a map-only scan + TakeOrdered — no
  * shuffle anywhere but the final k-row gather. Unencodable vectors
  * (wrong length, null elements) encode to NULL and are excluded from
  * the index with a counted audit, never silently mis-indexed. */
object PqIndex {

  /** The fitted quantizer: `centroids(j)(c)` is centroid `c` of subspace
    * `j`, each of length `dsub = dim / m`. `k` is the REQUESTED codes per
    * subspace; `centroids(j).length` may be smaller (Spark KMeans returns
    * fewer centers when a subspace has fewer distinct points than k —
    * constant padding dims, quantized features), so every consumer sizes
    * by the actual per-subspace count, never by k. */
  final case class Codebook(m: Int, k: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]]) {
    def dim: Int = m * dsub

    /** Map-only encode column: array<double> → m-byte code (null when
      * unencodable). */
    def encodeCol(vec: Column): Column =
      graft.functions.VectorFunctions.pq_encode(vec.cast("array<double>"), centroids)

    /** The query's per-subspace distance table: `table(j)(c)` = exact
      * squared L2 between the query's j-th subvector and centroid c. */
    def adcTable(q: Array[Double]): Array[Array[Double]] = {
      require(q.length == dim, s"pq: query dim ${q.length}, index dim $dim")
      Array.tabulate(m) { j =>
        Array.tabulate(centroids(j).length) { c =>
          val cent = centroids(j)(c)
          var d = 0.0
          var t = 0
          while (t < dsub) {
            val diff = q(j * dsub + t) - cent(t)
            d += diff * diff
            t += 1
          }
          d
        }
      }
    }

    /** ADC distance column for one query (NaN for malformed codes). */
    def adcCol(codes: Column, q: Array[Double]): Column =
      graft.functions.VectorFunctions.pq_adc(codes, adcTable(q))

    /** Exact squared L2 the ADC approximates, restricted to the codebook:
      * decode of a code back to its centroid concatenation. Exposed for
      * the spec's exactness property (a corpus representable by the
      * codebook has ADC ≡ exact distance). */
    def decode(codes: Array[Byte]): Array[Double] = {
      require(codes.length == m, s"pq: code length ${codes.length}, m $m")
      val out = new Array[Double](dim)
      var j = 0
      while (j < m) {
        System.arraycopy(centroids(j)(codes(j) & 0xff), 0, out, j * dsub, dsub)
        j += 1
      }
      out
    }
  }

  /** Fit the per-subspace codebooks: m KMeans runs (squared euclidean,
    * fixed seed per subspace) over a deterministic hash-sample of at most
    * `fitSample` rows — the [[IvfIndex]] quantizer-sampling rationale:
    * at 10^9 vectors a full-corpus fit would iterate the table 10× per
    * subspace for centroids a representative sample fits equally well. */
  def fitCodebook(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int = 256, fitSample: Long = 200000L): Codebook = {
    require(k >= 1 && k <= 256, s"pq: k must be 1..256 (codes are bytes), got $k")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e0 = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("e"))
    // dimension = the corpus's DOMINANT vector length, not whichever row
    // happens to scan first: one malformed leading row must not poison
    // the fit filter (or fail the divisibility require) for 10^9 good rows
    val dimRows = e0.filter(col("e").isNotNull)
      .groupBy(size(col("e")).as("__d")).count()
      .orderBy(desc("count"), col("__d")).take(1)
    require(dimRows.nonEmpty,
      "pq: no encodable vectors — the embedding relation is empty or all-null")
    val dim = dimRows(0).getInt(0)
    require(dim % m == 0, s"pq: dim $dim not divisible by m $m")
    val dsub = dim / m
    // the fit sees only encodable vectors — null / wrong-length /
    // null-element rows are the encode stage's gate, not the quantizer's
    val e = e0.filter(col("e").isNotNull && size(col("e")) === dim &&
      !exists(col("e"), _.isNull))
    val nRows = e.count()
    val train0 =
      if (nRows <= fitSample) e
      else e.filter(pmod(xxhash64(col("id")), lit(nRows / fitSample)) === 0)
    // all m fits read the same sampled rows: materialize the sample once
    val train = train0.cache()
    try {
      val centroids = Array.tabulate(m) { j =>
        val sub = train.select(
          array_to_vector(slice(col("e"), j * dsub + 1, dsub)).as("features"))
        val model = new KMeans().setK(k).setSeed(42L + j).setMaxIter(10).fit(sub)
        model.clusterCenters.map(_.toArray)
      }
      Codebook(m, k, dsub, centroids)
    } finally { train.unpersist(); () }
  }

  /** Fit + encode + persist under `dataRoot`. Returns (codebook, encoded
    * rows, input rows). */
  private def fitEncodeWrite(spark: SparkSession, dataRoot: String,
      emb: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
      fitSample: Long): (Codebook, Long, Long) = {
    val cb = fitCodebook(emb, idCol, vecCol, m, k, fitSample)
    val sfs = StateFs(spark)
    import spark.implicits._
    cb.centroids.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(sfs.child(dataRoot, "codebook"))
    val encoded = emb.select(col(idCol).as("id"),
        cb.encodeCol(col(vecCol)).as("codes"))
    val obs = org.apache.spark.sql.Observation()
    encoded.observe(obs,
        count(lit(1)).as("n"), count(col("codes")).as("nEnc"))
      .filter(col("codes").isNotNull)
      .write.mode("overwrite").parquet(sfs.child(dataRoot, "codes"))
    (cb, obs.get("nEnc").asInstanceOf[Long], obs.get("n").asInstanceOf[Long])
  }

  /** Fit + encode + persist. Returns the index handle and the count of
    * unencodable rows (wrong length / null elements) EXCLUDED from the
    * index — callers treat nonzero as a data-quality signal, the same
    * contract as the image gates. */
  def build(spark: SparkSession, dir: String, emb: DataFrame,
      idCol: String, vecCol: String, m: Int, k: Int = 256,
      fitSample: Long = 200000L): (PqIndex, Long) = {
    val (cb, nEnc, n) = fitEncodeWrite(spark, dir, emb, idCol, vecCol, m, k, fitSample)
    val sfs = StateFs(spark)
    val props = new Properties()
    props.setProperty("m", m.toString)
    props.setProperty("k", k.toString)
    props.setProperty("dsub", cb.dsub.toString)
    props.setProperty("rows", nEnc.toString)
    props.setProperty("builtRows", nEnc.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    (new PqIndex(spark, dir), n - nEnc)
  }

  /** The maintenance entry [[PqIndex#needsRebuild]] cues: once appends
    * drift past `threshold` × the fit corpus, refit the codebooks and
    * re-encode from `emb` — the caller's AUTHORITATIVE embedding relation
    * (the lake table the index serves). Unlike [[IvfIndex.maintain]], a
    * PQ rebuild cannot feed on the index's own postings: codes are LOSSY
    * (decode returns centroids, not vectors), so refitting on them would
    * compound quantization error generation over generation.
    *
    * Crash-safe the IVF way: the new generation is fully written under
    * `dir/gen-N` before one atomic `_meta` flip publishes it; a crash
    * mid-rebuild leaves the live generation untouched, and superseded
    * files are deleted best-effort only after the flip. Returns whether a
    * rebuild ran. */
  def maintain(spark: SparkSession, dir: String, emb: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.5,
      fitSample: Long = 200000L): Boolean = {
    val idx = load(spark, dir)
    if (!idx.needsRebuild(threshold)) return false
    val sfs = StateFs(spark)
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    val oldGen = Option(props.getProperty("gen")).map(_.toInt)
    val newGen = oldGen.getOrElse(-1) + 1
    val oldRoot = oldGen.fold(dir)(g => sfs.child(dir, s"gen-$g"))
    val newRoot = sfs.child(dir, s"gen-$newGen")
    val (m, k) = (props.getProperty("m").toInt, props.getProperty("k").toInt)
    val (cb, nEnc, _) = fitEncodeWrite(spark, newRoot, emb, idCol, vecCol,
      m, k, fitSample)
    props.setProperty("gen", newGen.toString)
    props.setProperty("dsub", cb.dsub.toString)
    props.setProperty("rows", nEnc.toString)
    props.setProperty("builtRows", nEnc.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    try {
      sfs.delete(sfs.child(oldRoot, "codebook"))
      sfs.delete(sfs.child(oldRoot, "codes"))
      if (oldGen.isDefined) sfs.delete(oldRoot)
    } catch { case _: Exception => () }
    true
  }

  def load(spark: SparkSession, dir: String): PqIndex = {
    val sfs = StateFs(spark)
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    new PqIndex(spark, dir, Option(props.getProperty("gen")).map(_.toInt))
  }
}

/** Handle over a persisted PQ index directory: `codebook/` (m×k centroid
  * rows), `codes/` (id, m-byte code), `_meta.properties`. Rebuilds
  * ([[PqIndex.maintain]]) write `dir/gen-N` and flip the `_meta` pointer;
  * a fresh [[PqIndex.build]] uses `dir` itself (gen absent). */
final class PqIndex(spark: SparkSession, val dir: String,
    val gen: Option[Int] = None) {
  private val sfs = StateFs(spark)

  private def dataRoot: String = gen.fold(dir)(g => sfs.child(dir, s"gen-$g"))

  private def loadMeta(): Properties = {
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    props
  }

  @transient lazy val codebook: PqIndex.Codebook = {
    val p = loadMeta()
    val (m, k, dsub) = (p.getProperty("m").toInt, p.getProperty("k").toInt,
      p.getProperty("dsub").toInt)
    // sized by the ACTUAL per-subspace center count (may be < k when a
    // subspace had fewer distinct points) — codes are dense 0..count-1,
    // so max(code)+1 per subspace reconstructs the ragged layout exactly
    val rows = spark.read.parquet(sfs.child(dataRoot, "codebook")).collect()
    val cents = Array.tabulate(m) { j =>
      new Array[Array[Double]](rows.filter(_.getInt(0) == j).map(_.getInt(1)).max + 1)
    }
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    PqIndex.Codebook(m, k, dsub, cents)
  }

  def codes: DataFrame = spark.read.parquet(sfs.child(dataRoot, "codes"))

  /** Indexed vectors (build + appends), fresh from `_meta`. */
  def rows: Long = loadMeta().getProperty("rows", "0").toLong

  /** Codebook-fit corpus size — the [[IvfIndex]] drift-guard pair. */
  def builtRows: Long = {
    val p = loadMeta()
    p.getProperty("builtRows", p.getProperty("rows", "0")).toLong
  }

  def appendedFraction: Double = {
    val total = rows
    val built = builtRows
    if (built <= 0) 0.0 else (total - built).toDouble / built
  }

  /** True once appends exceed `threshold` × the fit corpus — the frozen
    * codebook's reconstruction error grows with distribution drift the
    * same way the IVF quantizer's list assignment does. */
  def needsRebuild(threshold: Double = 0.5): Boolean =
    appendedFraction > threshold

  /** Encode new vectors with the FROZEN codebook and append — map-only,
    * O(delta). Returns the count of unencodable rows excluded. A handle
    * loaded before a [[PqIndex.maintain]] rebuild refuses to write: its
    * codebook (and codes root) belong to a superseded generation, so an
    * append through it would land vectors no reader serves. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Long = {
    val liveGen = Option(loadMeta().getProperty("gen")).map(_.toInt)
    if (liveGen != gen)
      throw new IllegalStateException(s"pq: stale handle (gen $gen, live " +
        s"$liveGen) — the index was rebuilt; re-load before appending")
    val encoded = emb.select(col(idCol).as("id"),
      codebook.encodeCol(col(vecCol)).as("codes"))
    val obs = org.apache.spark.sql.Observation()
    encoded.observe(obs,
        count(lit(1)).as("n"), count(col("codes")).as("nEnc"))
      .filter(col("codes").isNotNull)
      .write.mode("append").parquet(sfs.child(dataRoot, "codes"))
    val n = obs.get("n").asInstanceOf[Long]
    val nEnc = obs.get("nEnc").asInstanceOf[Long]
    val props = loadMeta()
    props.setProperty("rows", (props.getProperty("rows", "0").toLong + nEnc).toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    n - nEnc
  }

  /** Approximate top-k by ADC squared L2: one map-only scan of the code
    * table (m byte-lookups per row, codegen'd) + TakeOrdered. Ties and
    * the final order break on id — deterministic under any partitioning.
    * Malformed codes score NaN and are excluded (the PSNR-filter
    * contract), never ride a NaN-sorts-last surprise into the result. */
  def topK(q: Array[Double], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val scored = codes
      .withColumn("adc", codebook.adcCol(col("codes"), q))
      .filter(!isnan(col("adc")))
    excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
      .select(col("id"), round(col("adc"), 9).as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(k)
  }

  /** ADC shortlist → exact-cosine rerank over the caller's embedding
    * relation (the raw vectors live in the lake, not in the index): the
    * top `k × shortlistFactor` codes attach their float vectors by one id
    * equi-join, and exact cosine orders the final k. Approximation error
    * confined to shortlist membership — scores in the result are exact. */
  def topKRerank(q: Array[Double], k: Int, emb: DataFrame, idCol: String,
      vecCol: String, shortlistFactor: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    // the caller's relation may itself carry an `id` column (idCol == "id"
    // is the natural lake schema) — alias the shortlist side so the join
    // condition never resolves ambiguously
    val shortlist = topK(q, k * shortlistFactor, excludeId)
      .select(col("id").as("__sid"))
    emb.join(shortlist, emb(idCol) === col("__sid"), "left_semi")
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"))
      // a zero-norm shortlist vector has no direction to rank (and under
      // ANSI mode the cosine division would FAIL the job, not NaN) — it
      // drops, the alignmentScore contract applied to rerank
      .filter(graft.functions.VectorFunctions.array_dot(col("e"), col("e")) > 0)
      .withColumn("qe", typedLit(q.toSeq))
      .withColumn("cos", round(Similarity.cosine("e", "qe"), 6))
      .select(col("id"), col("cos"))
      .orderBy(desc("cos"), col("id"))
      .limit(k)
  }
}
