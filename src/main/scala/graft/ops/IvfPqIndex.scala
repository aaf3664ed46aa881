package graft.ops

import java.util.Properties

import graft.io.StateFs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC (Jégou et al. 2011 §IV — the FAISS `IVFx,PQy` architecture):
  * [[IvfIndex]]'s coarse quantizer composed with [[PqIndex]]'s product
  * codes. A coarse KMeans over FULL vectors partitions the corpus into
  * `nLists` posting lists; within each list a vector is stored as the
  * m-byte PQ code of its RESIDUAL (v − coarse centroid) — residuals
  * concentrate near zero, so the same byte budget quantizes them with
  * far less error than raw vectors. A query probes the `nProbe` nearest
  * lists and ADC-scans ONLY those lists' codes, with a per-probed-list
  * distance table built from the query's own residual against that list.
  *
  * Why this is the 100 TB serving shape: [[PqIndex]] alone scans every
  * code per query (fine in page cache, still O(corpus)); [[IvfIndex]]
  * alone prunes to nProbe lists but stores float vectors (3 KB/row at
  * 768d). Composed, a query touches `nProbe/nLists` of an already
  * ~200×-compressed table — both pruning axes at once, which is how a
  * 10^11-vector index serves from a handful of machines. Exact rerank
  * ([[IvfPqIndex#topKRerank]]) re-attaches lake floats for the shortlist
  * only, so approximation error is confined to shortlist membership.
  *
  * Scale shape: both fits sample-bounded; assignment + residual encode is
  * a map-only projection (coarse centroids broadcast as a literal, the
  * PQ codebook plan-embedded); codes persist partitioned by `list`, so a
  * probe is a partition-pruned scan (asserted via inputFiles in the
  * spec). Unencodable vectors gate out counted. Drift is accounted the
  * [[IvfIndex]]/[[PqIndex]] way, and [[IvfPqIndex.maintain]] rebuilds
  * BOTH quantizers from the authoritative lake relation behind the same
  * gen-addressed atomic pointer (codes are lossy — rebuilds never feed
  * on the index's own output). */
object IvfPqIndex {

  /** Assignment + residual as columns: `list` = nearest coarse centroid
    * (squared L2, lowest list wins ties — the [[IvfIndex.append]]
    * construction), `residual` = v − centroid(list). The residual HOF is
    * interpreted, but it runs once per INGESTED vector, never on the
    * query path. */
  private def assignResidual(e: DataFrame,
      coarse: Array[(Int, Array[Double])]): DataFrame = {
    val centsLit = typedLit(coarse.map { case (i, c) => (i, c.toSeq) }.toSeq)
    e.withColumn("__asg",
        array_min(transform(centsLit, c => struct(
          graft.functions.VectorFunctions.array_sqdist(c.getField("_2"), col("e")).as("d"),
          c.getField("_1").as("list"),
          c.getField("_2").as("cent")))))
      .withColumn("list", col("__asg.list"))
      .withColumn("residual",
        zip_with(col("e"), col("__asg.cent"), (a, b) => a - b))
      .drop("__asg")
  }

  private def fitCoarse(train: DataFrame, nLists: Int): Array[(Int, Array[Double])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans().setK(nLists).setSeed(7L).setMaxIter(10)
      .fit(train.select(array_to_vector(col("e")).as("features")))
    model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
  }

  /** Fit coarse + residual codebooks, encode, persist under `dataRoot`.
    * Returns (codebook, coarse, encoded rows, input rows). */
  private def fitEncodeWrite(spark: SparkSession, dataRoot: String,
      emb: DataFrame, idCol: String, vecCol: String, nLists: Int, m: Int,
      k: Int, fitSample: Long):
      (PqIndex.Codebook, Array[(Int, Array[Double])], Long, Long) = {
    val sfs = StateFs(spark)
    import spark.implicits._
    val e0 = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("e"))
    val dimRows = e0.filter(col("e").isNotNull)
      .groupBy(size(col("e")).as("__d")).count()
      .orderBy(desc("count"), col("__d")).take(1)
    require(dimRows.nonEmpty,
      "ivfpq: no encodable vectors — the embedding relation is empty or all-null")
    val dim = dimRows(0).getInt(0)
    require(dim % m == 0, s"ivfpq: dim $dim not divisible by m $m")
    val e = e0.filter(col("e").isNotNull && size(col("e")) === dim &&
      !exists(col("e"), _.isNull))
    val nRows = e.count()
    val nAll = e0.count()
    val train0 =
      if (nRows <= fitSample) e
      else e.filter(pmod(xxhash64(col("id")), lit(nRows / fitSample)) === 0)
    val train = train0.cache()
    val (coarse, cb) =
      try {
        val coarse = fitCoarse(train, nLists)
        // the PQ codebook quantizes RESIDUALS — fit it on the sample's own
        // residuals against the just-fit coarse centroids
        val cb = PqIndex.fitCodebook(
          assignResidual(train, coarse).select(col("id"), col("residual")),
          "id", "residual", m, k, fitSample)
        (coarse, cb)
      } finally { train.unpersist(); () }
    coarse.map { case (i, c) => (i, c.toSeq) }.toSeq.toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(sfs.child(dataRoot, "coarse"))
    cb.centroids.zipWithIndex.flatMap { case (cents, j) =>
      cents.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(sfs.child(dataRoot, "codebook"))
    val encoded = assignResidual(e, coarse)
      .select(col("id"), col("list"), cb.encodeCol(col("residual")).as("codes"))
      .filter(col("codes").isNotNull)
    encoded.write.mode("overwrite").partitionBy("list")
      .parquet(sfs.child(dataRoot, "codes"))
    (cb, coarse, nRows, nAll)
  }

  /** Fit + encode + persist. Returns the handle and the count of
    * unencodable rows excluded ([[PqIndex.build]]'s contract). */
  def build(spark: SparkSession, dir: String, emb: DataFrame,
      idCol: String, vecCol: String, nLists: Int, m: Int, k: Int = 256,
      fitSample: Long = 200000L): (IvfPqIndex, Long) = {
    val (cb, _, nEnc, nAll) = fitEncodeWrite(spark, dir, emb, idCol, vecCol,
      nLists, m, k, fitSample)
    val sfs = StateFs(spark)
    val props = new Properties()
    props.setProperty("nLists", nLists.toString)
    props.setProperty("m", m.toString)
    props.setProperty("k", k.toString)
    props.setProperty("dsub", cb.dsub.toString)
    props.setProperty("rows", nEnc.toString)
    props.setProperty("builtRows", nEnc.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    (new IvfPqIndex(spark, dir), nAll - nEnc)
  }

  /** Drift-gated rebuild of BOTH quantizers from the lake relation,
    * published behind the gen-addressed atomic `_meta` flip
    * ([[PqIndex.maintain]]'s construction and rationale). */
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
    val (cb, _, nEnc, _) = fitEncodeWrite(spark, newRoot, emb, idCol, vecCol,
      props.getProperty("nLists").toInt, props.getProperty("m").toInt,
      props.getProperty("k").toInt, fitSample)
    props.setProperty("gen", newGen.toString)
    props.setProperty("dsub", cb.dsub.toString)
    props.setProperty("rows", nEnc.toString)
    props.setProperty("builtRows", nEnc.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    try {
      sfs.delete(sfs.child(oldRoot, "coarse"))
      sfs.delete(sfs.child(oldRoot, "codebook"))
      sfs.delete(sfs.child(oldRoot, "codes"))
      if (oldGen.isDefined) sfs.delete(oldRoot)
    } catch { case _: Exception => () }
    true
  }

  def load(spark: SparkSession, dir: String): IvfPqIndex = {
    val sfs = StateFs(spark)
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    new IvfPqIndex(spark, dir, Option(props.getProperty("gen")).map(_.toInt))
  }
}

/** Handle over a persisted IVFADC directory: `coarse/` (nLists centroid
  * rows), `codebook/` (residual PQ codebooks), `codes/` partitioned by
  * `list`, `_meta.properties` (gen-addressed on rebuild). */
final class IvfPqIndex(spark: SparkSession, val dir: String,
    val gen: Option[Int] = None) {
  private val sfs = StateFs(spark)
  private def dataRoot: String = gen.fold(dir)(g => sfs.child(dir, s"gen-$g"))

  private def loadMeta(): Properties = {
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    props
  }

  @transient lazy val coarse: Array[(Int, Array[Double])] =
    spark.read.parquet(sfs.child(dataRoot, "coarse")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  @transient lazy val codebook: PqIndex.Codebook = {
    val p = loadMeta()
    val (m, k, dsub) = (p.getProperty("m").toInt, p.getProperty("k").toInt,
      p.getProperty("dsub").toInt)
    val rows = spark.read.parquet(sfs.child(dataRoot, "codebook")).collect()
    val cents = Array.tabulate(m) { j =>
      new Array[Array[Double]](rows.filter(_.getInt(0) == j).map(_.getInt(1)).max + 1)
    }
    rows.foreach(r => cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    PqIndex.Codebook(m, k, dsub, cents)
  }

  def codes: DataFrame = spark.read.parquet(sfs.child(dataRoot, "codes"))

  def rows: Long = loadMeta().getProperty("rows", "0").toLong
  def builtRows: Long = {
    val p = loadMeta()
    p.getProperty("builtRows", p.getProperty("rows", "0")).toLong
  }
  def appendedFraction: Double = {
    val (total, built) = (rows, builtRows)
    if (built <= 0) 0.0 else (total - built).toDouble / built
  }
  def needsRebuild(threshold: Double = 0.5): Boolean =
    appendedFraction > threshold

  /** The `nProbe` lists nearest the query — driver-side over nLists rows
    * (the [[IvfIndex#probeLists]] construction). */
  def probeLists(q: Array[Double], nProbe: Int): Seq[Int] =
    coarse.map { case (i, c) =>
      (i, c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq

  /** Pruned scan of one posting list's codes: reads the `list=` partition
    * PATH directly (manifest-level pruning by construction — the IceLite
    * pattern), because `Dataset.inputFiles` and the listing cost of a
    * filter-pruned read still enumerate the whole table. A list that
    * never received a row has no directory; callers skip it (no rows is
    * no rows). Exposed for the spec's inputFiles assertion. */
  def probeScan(list: Int): DataFrame =
    spark.read.parquet(sfs.child(dataRoot, "codes", s"list=$list"))
      .withColumn("list", lit(list))

  private def probeScanOpt(list: Int): Option[DataFrame] =
    if (sfs.exists(sfs.child(dataRoot, "codes", s"list=$list"))) Some(probeScan(list))
    else None

  /** Frozen-quantizer append: assign + residual-encode the delta and
    * write into the `list=` partitions — map-only, O(delta). Stale
    * handles (loaded before a [[IvfPqIndex.maintain]]) refuse to write,
    * [[PqIndex#append]]'s contract. Returns unencodable rows excluded. */
  def append(emb: DataFrame, idCol: String, vecCol: String): Long = {
    val liveGen = Option(loadMeta().getProperty("gen")).map(_.toInt)
    if (liveGen != gen)
      throw new IllegalStateException(s"ivfpq: stale handle (gen $gen, live " +
        s"$liveGen) — the index was rebuilt; re-load before appending")
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("e"))
    val encoded = IvfPqIndex.assignResidual(e, coarse)
      .select(col("id"), col("list"),
        codebook.encodeCol(col("residual")).as("codes"))
    val obs = org.apache.spark.sql.Observation()
    encoded.observe(obs,
        count(lit(1)).as("n"), count(col("codes")).as("nEnc"))
      .filter(col("codes").isNotNull)
      .write.mode("append").partitionBy("list")
      .parquet(sfs.child(dataRoot, "codes"))
    val n = obs.get("n").asInstanceOf[Long]
    val nEnc = obs.get("nEnc").asInstanceOf[Long]
    val props = loadMeta()
    props.setProperty("rows", (props.getProperty("rows", "0").toLong + nEnc).toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    n - nEnc
  }

  /** Approximate top-k: probe `nProbe` lists, ADC-scan each probed list
    * with ITS OWN residual table (the query's residual against that
    * list's centroid), union, TakeOrdered. Each per-list scan is
    * partition-pruned; ties and the final order break on id. */
  def topK(q: Array[Double], k: Int, nProbe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val cmap = coarse.toMap
    val scans = probeLists(q, nProbe).flatMap { l =>
      probeScanOpt(l).map { scan =>
        val cent = cmap(l)
        val qRes = Array.tabulate(q.length)(i => q(i) - cent(i))
        scan.withColumn("adc", codebook.adcCol(col("codes"), qRes))
      }
    }
    val scored = scans
      .reduceOption(_.unionByName(_))
      // every probed list empty: a well-typed empty relation
      .getOrElse(codes.filter(lit(false)).withColumn("adc", lit(0.0)))
      .filter(!isnan(col("adc")))
    excludeId.fold(scored)(x => scored.filter(col("id") =!= x))
      .select(col("id"), round(col("adc"), 9).as("adc"), col("list"))
      .orderBy(col("adc"), col("id"))
      .limit(k)
  }

  /** ADC shortlist → exact-cosine rerank against the lake relation —
    * [[PqIndex#topKRerank]]'s contract (zero-norm shortlist vectors
    * drop; scores in the result are exact round-6 cosines). */
  def topKRerank(q: Array[Double], k: Int, emb: DataFrame, idCol: String,
      vecCol: String, nProbe: Int = 4, shortlistFactor: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val shortlist = topK(q, k * shortlistFactor, nProbe, excludeId)
      .select(col("id").as("__sid"))
    emb.join(shortlist, emb(idCol) === col("__sid"), "left_semi")
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"))
      .filter(graft.functions.VectorFunctions.array_dot(col("e"), col("e")) > 0)
      .withColumn("qe", typedLit(q.toSeq))
      .withColumn("cos", round(Similarity.cosine("e", "qe"), 6))
      .select(col("id"), col("cos"))
      .orderBy(desc("cos"), col("id"))
      .limit(k)
  }
}
