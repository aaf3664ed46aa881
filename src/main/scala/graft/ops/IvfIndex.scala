package graft.ops

import graft.io.StateFs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.util.Properties

/** Persisted IVF (inverted-file) ANN index — build once, probe many.
  *
  * [[Similarity.ivfTopK]] is the one-shot form: it refits the k-means
  * quantizer and re-scans the corpus on every call, which is wrong for a
  * pipeline serving many queries. This index splits the lifecycle:
  *
  *  - [[IvfIndex.build]] (once): sample-fit the quantizer, assign every
  *    vector to its nearest centroid, and persist
  *      `dir/centroids/`    tiny parquet (list, centroid)
  *      `dir/assignments/`  parquet PARTITIONED BY list — the posting lists
  *      `dir/_meta.properties`
  *  - [[IvfIndex.load]] + [[IvfIndex#topK]] (many): probing reads ONLY the
  *    `nProbe` posting-list partitions (Spark partition pruning on `list`),
  *    never refits, never counts the corpus — per-query cost is
  *    O(corpus × nProbe / nLists) scan + one top-k.
  *
  * The quantizer's centroid step is k-means over a deterministic hash
  * sample (seed fixed; KMeans is deterministic per Spark version but not
  * engine-portable, so recall is ScalaTest-verified against the exact
  * [[Similarity.cosineTopK]] rather than oracle-hashed). All metadata I/O
  * goes through [[graft.io.StateFs]], so `dir` may live on any Hadoop
  * filesystem scheme.
  */
object IvfIndex {

  /** Fit + assign + persist. One full count (sampling denominator) and one
    * KMeans fit happen HERE and never again. */
  def build(spark: SparkSession, dir: String, emb: DataFrame,
      idCol: String, vecCol: String, nLists: Int = 16,
      fitSample: Long = 200000L): IvfIndex = {
    val sfs = StateFs(spark)
    val nRows = fitAssignWrite(spark, dir, emb, idCol, vecCol, nLists, fitSample)
    val props = new Properties()
    props.setProperty("nLists", nLists.toString)
    props.setProperty("rows", nRows.toString)
    // frozen-quantizer drift guard: `rows` grows with every append while
    // `builtRows` never moves — their ratio is the recall-degradation
    // signal [[IvfIndex#needsRebuild]] exposes
    props.setProperty("builtRows", nRows.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    new IvfIndex(spark, dir, nLists)
  }

  /** Fit + assign + persist under `dataRoot` (the gen-addressed data
    * directory — `dir` itself for a fresh build, `dir/gen-N` for a
    * [[maintain]] rebuild). Returns the corpus row count. One full count
    * (sampling denominator) and one KMeans fit happen HERE and never
    * again for this generation. */
  private def fitAssignWrite(spark: SparkSession, dataRoot: String,
      emb: DataFrame, idCol: String, vecCol: String, nLists: Int,
      fitSample: Long): Long = {
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

    val sfs = StateFs(spark)
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(sfs.child(dataRoot, "centroids"))
    model.transform(e).withColumnRenamed("prediction", "list")
      .select(col(idCol).as("id"), col("e"), col("list"))
      .write.mode("overwrite").partitionBy("list")
      .parquet(sfs.child(dataRoot, "assignments"))
    nRows
  }

  /** The maintenance entry [[IvfIndex#needsRebuild]] cues: if (and only
    * if) appends have drifted past `threshold` × built corpus, refit the
    * quantizer and re-partition the posting lists FROM THE INDEX'S OWN
    * postings (build + every append — no external corpus relation, no
    * re-decode/re-embed), then reset the drift counters. Returns whether a
    * rebuild ran.
    *
    * Crash-safe the same way the crawl's seen-filter snapshots are
    * (orphan files, never a dangling pointer): the new generation is fully
    * written under `dir/gen-N` before one atomic `_meta` flip publishes
    * it; a crash mid-rebuild leaves the live generation untouched. The
    * superseded generation's files are deleted best-effort AFTER the flip
    * — handles opened before the flip keep their loaded centroids but
    * should be re-[[load]]ed to see the new postings. */
  def maintain(spark: SparkSession, dir: String, threshold: Double = 0.5,
      nLists: Option[Int] = None, fitSample: Long = 200000L): Boolean = {
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
    val lists = nLists.getOrElse(idx.nLists)
    val n = fitAssignWrite(spark, newRoot,
      spark.read.parquet(sfs.child(oldRoot, "assignments")).select("id", "e"),
      "id", "e", lists, fitSample)
    props.setProperty("gen", newGen.toString)
    props.setProperty("nLists", lists.toString)
    props.setProperty("rows", n.toString)
    props.setProperty("builtRows", n.toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
    // best-effort reclaim of the superseded generation (legacy layout:
    // the root-level data dirs); the pointer already moved, so a failure
    // here only leaks files
    try {
      sfs.delete(sfs.child(oldRoot, "centroids"))
      sfs.delete(sfs.child(oldRoot, "assignments"))
      if (oldGen.isDefined) sfs.delete(oldRoot)
    } catch { case _: Exception => () }
    true
  }

  def load(spark: SparkSession, dir: String): IvfIndex = {
    val sfs = StateFs(spark)
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    new IvfIndex(spark, dir, props.getProperty("nLists").toInt,
      Option(props.getProperty("gen")).map(_.toInt))
  }
}

final class IvfIndex(spark: SparkSession, val dir: String, val nLists: Int,
    val gen: Option[Int] = None) {
  private val sfs = StateFs(spark)

  /** Gen-addressed data directory: rebuilds ([[IvfIndex.maintain]]) write
    * `dir/gen-N` and flip the `_meta` pointer; a fresh [[IvfIndex.build]]
    * uses `dir` itself (gen absent — the legacy layout). */
  private def dataRoot: String = gen.fold(dir)(g => sfs.child(dir, s"gen-$g"))

  /** The quantizer: nLists rows, loaded once per index handle. */
  @transient lazy val centroids: Array[(Int, Array[Double])] =
    spark.read.parquet(sfs.child(dataRoot, "centroids")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))

  private def assignments: DataFrame =
    spark.read.parquet(sfs.child(dataRoot, "assignments"))

  /** Incrementally absorb new vectors (the serving pipeline's path for
    * freshly crawled embeddings): assign each to its nearest EXISTING
    * centroid and append into the `list=` posting-list partitions. The
    * assignment is a per-row argmin over the quantizer shipped as a literal
    * (nLists rows) — a map-only job: no shuffle, no KMeans refit, no corpus
    * scan, so appending N vectors costs O(N) regardless of index size.
    * Probes and partition pruning work unchanged on the grown index.
    *
    * The quantizer stays frozen at build time: after sustained distribution
    * drift (append volume on the order of the built corpus) rebuild the
    * index — [[needsRebuild]] is the programmatic signal ( `_meta` tracks
    * `builtRows` vs total `rows`, so a long-running serving pipeline can
    * alert/rebuild instead of silently degrading recall). Appending an id
    * that is already indexed adds a second posting entry — dedup upstream
    * (e.g. [[Dedup.exact]]).
    *
    * A handle loaded before an [[IvfIndex.maintain]] rebuild refuses to
    * write (same contract as [[PqIndex.append]]): its centroids and data
    * root belong to a superseded generation, so an append through it would
    * land vectors in a directory no reader of the live generation serves
    * while still bumping the shared `rows` counter.
    */
  def append(emb: DataFrame, idCol: String, vecCol: String): Unit = {
    val liveGen = Option(loadMeta().getProperty("gen")).map(_.toInt)
    if (liveGen != gen)
      throw new IllegalStateException(s"ivf: stale handle (gen $gen, live " +
        s"$liveGen) — the index was rebuilt; re-load before appending")
    // same metric and tie-break as the build's KMeans transform: squared
    // euclidean, lowest list id wins ties (struct ordering on (d, list))
    val centsLit = typedLit(centroids.map { case (i, c) => (i, c.toSeq) }.toSeq)
    val assigned = emb
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("e"))
      .withColumn("list",
        array_min(transform(centsLit, c => struct(
          graft.functions.VectorFunctions.array_sqdist(c.getField("_2"), col("e")).as("d"),
          c.getField("_1").as("list")))).getField("list"))
      .select(col("id"), col("e"), col("list"))
    val obs = org.apache.spark.sql.Observation()
    assigned.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").partitionBy("list").parquet(sfs.child(dataRoot, "assignments"))
    val n = obs.get("n").asInstanceOf[Long]
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    props.setProperty("rows", (props.getProperty("rows", "0").toLong + n).toString)
    sfs.writeAtomic(sfs.child(dir, "_meta.properties"))(out => props.store(out, null))
  }

  private def loadMeta(): Properties = {
    val props = new Properties()
    val in = sfs.open(sfs.child(dir, "_meta.properties"))
    try props.load(in) finally in.close()
    props
  }

  /** Total indexed vectors (build + all appends). Read fresh from `_meta`
    * so a long-lived handle sees other writers' appends. */
  def rows: Long = loadMeta().getProperty("rows", "0").toLong

  /** Vectors the frozen quantizer was fit against. Legacy metas (pre-drift-
    * guard) lack the property; they read as the CURRENT row count, i.e.
    * drift unknown ⇒ reported as 0 — rebuild once to start tracking. */
  def builtRows: Long = {
    val p = loadMeta()
    p.getProperty("builtRows", p.getProperty("rows", "0")).toLong
  }

  /** Appended volume relative to the built corpus — the quantizer-drift
    * proxy: appends are assigned to centroids fit before they existed, so
    * as this ratio grows the posting lists stop matching the data's real
    * cluster structure and probe recall decays. */
  def appendedFraction: Double = {
    val p = loadMeta()
    val total = p.getProperty("rows", "0").toLong
    val built = p.getProperty("builtRows", p.getProperty("rows", "0")).toLong
    if (built <= 0) 0.0 else (total - built).toDouble / built
  }

  /** True once appends exceed `threshold` × built corpus — the serving
    * pipeline's cue to schedule a [[IvfIndex.build]] rebuild. */
  def needsRebuild(threshold: Double = 0.5): Boolean =
    appendedFraction > threshold

  /** The `nProbe` lists whose centroids are nearest (squared euclidean)
    * to `q` — driver-side over the tiny centroid set. */
  def probeLists(q: Array[Double], nProbe: Int): Seq[Int] =
    centroids.map { case (i, c) =>
      (i, c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq

  /** Posting-list scan for the probed lists — the `list` filter prunes to
    * those partitions; exposed for plan/pruning inspection in tests. */
  def probeScan(lists: Seq[Int]): DataFrame =
    assignments.filter(col("list").isInCollection(lists))

  /** Approximate top-k by exact cosine within the probed posting lists.
    * No fit, no corpus count — one pruned scan + one top-k. */
  def topK(q: Array[Double], k: Int, nProbe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    val probed = probeScan(probeLists(q, nProbe))
    val base = excludeId.fold(probed)(x => probed.filter(col("id") =!= x))
    base.withColumn("qe", typedLit(q.toSeq))
      .withColumn("cos", round(Similarity.cosine("e", "qe"), 6))
      .select(col("id"), col("cos"), col("list"))
      .orderBy(desc("cos"), col("id"))
      .limit(k)
  }

  /** Convenience: query by the id of an indexed vector (one pruned-by-stats
    * lookup against the caller's embedding relation for the vector). */
  def topKById(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nProbe: Int = 4): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head().getSeq[Double](0).toArray
    topK(q, k, nProbe, excludeId = Some(queryId))
  }

  /** Batch-query API — fully distributed, one job for any number of query
    * vectors: rank centroids per query (broadcast of the nLists-row
    * centroid relation), keep each query's nProbe lists, join the posting
    * lists once on `list`, verify with exact cosine, window-top-k per
    * query. The assignments side shuffles at most once regardless of the
    * query count.
    *
    * `excludeQueryIds = true` (the self-query case: qids ARE corpus ids)
    * drops each query's own vector from its results; pass false when qids
    * are external labels — a label that happens to collide numerically
    * with a corpus id must not silently drop that (possibly nearest)
    * neighbor. */
  def topKBatch(queries: DataFrame, qidCol: String, vecCol: String,
      k: Int, nProbe: Int = 4, excludeQueryIds: Boolean = true): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"),
      col(vecCol).cast("array<double>").as("qe"))
    val cents = spark.read.parquet(sfs.child(dataRoot, "centroids"))
    val dist = graft.functions.VectorFunctions.array_sqdist(col("centroid"), col("qe"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cdist", dist)
      .withColumn("crank", row_number().over(
        Window.partitionBy("qid").orderBy(col("cdist"), col("list"))))
      .filter(col("crank") <= nProbe)
      .select("qid", "qe", "list")
    val cands = probes.join(assignments, Seq("list"))
    (if (excludeQueryIds) cands.filter(col("id") =!= col("qid")) else cands)
      .withColumn("cos", round(Similarity.cosine("e", "qe"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), col("id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }
}
