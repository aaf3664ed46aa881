package graft.ops

import graft.functions.TestSpark
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The persisted IVF index: build-once/probe-many. Queries must recall like
  * the one-shot [[Similarity.ivfTopK]] while doing NO k-means refit and NO
  * full-corpus scan — each probe reads only its posting-list partitions. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Sum of records read by all tasks while `body` runs. */
  private def recordsRead[T](body: => T): (T, Long) = {
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) n.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      Thread.sleep(600) // drain the listener bus
      (r, n.get)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("build once, probe many: recall preserved, no refit, pruned reads") {
    val dir = Files.createTempDirectory("graft-ivf-").toString
    val k = 10
    IvfIndex.build(spark, dir, emb, "vec_id", "embedding", nLists = 16)
    val corpusRows = emb.count()

    // reopened handle has no reference to the corpus — a refit or corpus
    // count is structurally impossible on the query path
    val idx = IvfIndex.load(spark, dir)
    assert(idx.nLists == 16 && idx.centroids.length == 16)

    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", queryId = 3L, k)
      .select("vec_id").as[Long].collect().toSet
    val first = idx.topKById(emb, "vec_id", "embedding", queryId = 3L, k, nProbe = 6)
      .select("id").as[Long].collect().toSet
    val recall = exact.intersect(first).size.toDouble / k
    assert(recall >= 0.5, s"IVF recall too low: $recall")

    // second query: same answer, and the work done is a pruned posting-list
    // scan — total records read stays far below one corpus pass (a KMeans
    // refit alone would read the corpus ~10×)
    val qvec = emb.filter($"vec_id" === 3L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val (second, read) = recordsRead {
      idx.topK(qvec, k, nProbe = 6, excludeId = Some(3L))
        .select("id").as[Long].collect().toSet
    }
    assert(second == first)
    assert(read < corpusRows,
      s"query read $read records — not a pruned probe over $corpusRows rows")

    // the probe scan's plan prunes partitions: only probed list= dirs appear
    val probed = idx.probeLists(qvec, 6)
    val scanned = idx.probeScan(probed)
    val planned = scanned.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(planned.nonEmpty)
    val partFilters = planned.head.metadata.getOrElse("PartitionFilters", "")
    assert(partFilters.contains("list"), s"no partition filter on list: $partFilters")
    assert(scanned.count() < corpusRows)
  }

  test("topKBatch: distributed multi-query probing matches per-query results") {
    val dir = Files.createTempDirectory("graft-ivfb-").toString
    val idx = IvfIndex.build(spark, dir, emb, "vec_id", "embedding", nLists = 16)
    val k = 5
    val qids = Seq(3L, 7L, 11L)
    val queries = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val batch = idx.topKBatch(queries, "qid", "qe", k, nProbe = 6)
      .select("qid", "id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    qids.foreach { q =>
      val single = idx.topKById(emb, "vec_id", "embedding", q, k, nProbe = 6)
        .select("id").as[Long].collect().toSet
      assert(batch(q) == single, s"batch result for query $q diverges")
    }

    // external query labels: a qid that numerically collides with a corpus
    // id must NOT lose that neighbor when exclusion is off — vector 3's own
    // row (cosine 1.0) tops its result
    val ext = idx.topKBatch(queries.filter($"qid" === 3L), "qid", "qe", k,
      nProbe = 6, excludeQueryIds = false)
      .filter($"rk" === 1).select("id", "cos").head()
    assert(ext.getLong(0) == 3L && ext.getDouble(1) == 1.0)
  }

  test("append: frozen-quantizer assignment, no refit, pruning and recall on the grown index") {
    val dir = Files.createTempDirectory("graft-ivfa-").toString
    val n = emb.count()
    val half = n / 2
    IvfIndex.build(spark, dir, emb.filter($"vec_id" < half), "vec_id", "embedding",
      nLists = 16)
    val idx = IvfIndex.load(spark, dir)
    val centsBefore = idx.centroids.map { case (i, c) => (i, c.toSeq) }.sortBy(_._1).toSeq

    idx.append(emb.filter($"vec_id" >= half), "vec_id", "embedding")

    // quantizer frozen: centroids byte-identical, meta row count grew
    val reloaded = IvfIndex.load(spark, dir)
    assert(reloaded.centroids.map { case (i, c) => (i, c.toSeq) }.sortBy(_._1).toSeq
      == centsBefore)
    val props = new java.util.Properties()
    val metaIn = new java.io.FileInputStream(s"$dir/_meta.properties")
    try props.load(metaIn) finally metaIn.close()
    assert(props.getProperty("rows").toLong == n)

    // every appended vector sits in its argmin list (same metric/tie-break
    // as the build assignment) — recomputed here from the raw vectors
    val stored = spark.read.parquet(s"$dir/assignments")
    assert(stored.count() == n)
    val appended = stored.filter($"id" >= half)
      .select($"id", $"e", $"list").as[(Long, Seq[Double], Int)].collect()
    assert(appended.length == (n - half))
    appended.take(50).foreach { case (id, e, list) =>
      val want = idx.centroids.map { case (i, c) =>
        (c.zip(e).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.min._2
      assert(list == want, s"vector $id assigned to $list, nearest centroid is $want")
    }

    // the grown index still prunes to probed partitions and still recalls:
    // query an APPENDED vector against the full corpus's exact answer
    val qid = half + 3
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", queryId = qid, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = idx.topKById(emb, "vec_id", "embedding", qid, 10, nProbe = 6)
      .select("id").as[Long].collect().toSet
    val recall = exact.intersect(got).size.toDouble / 10
    assert(recall >= 0.5, s"post-append recall too low: $recall")
    val qvec = emb.filter($"vec_id" === qid)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val scanned = idx.probeScan(idx.probeLists(qvec, 6))
    val planned = scanned.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val partFilters = planned.head.metadata.getOrElse("PartitionFilters", "")
    assert(partFilters.contains("list"), s"no partition filter on list: $partFilters")
    assert(scanned.count() < n)
  }

  test("drift guard: appendedFraction tracks appends, needsRebuild flips at threshold") {
    val dir = Files.createTempDirectory("graft-ivfd-").toString
    val n = emb.count()
    val built = (n * 3) / 5 // 60% built, 40% appended → fraction = 2/3
    IvfIndex.build(spark, dir, emb.filter($"vec_id" < built), "vec_id", "embedding",
      nLists = 8)
    val idx = IvfIndex.load(spark, dir)
    assert(idx.builtRows == built && idx.rows == built)
    assert(idx.appendedFraction == 0.0 && !idx.needsRebuild())

    idx.append(emb.filter($"vec_id" >= built), "vec_id", "embedding")
    assert(idx.rows == n, "append must grow rows")
    assert(idx.builtRows == built, "append must NOT move builtRows")
    val want = (n - built).toDouble / built
    assert(math.abs(idx.appendedFraction - want) < 1e-9)
    // 2/3 appended: above the default 0.5 cue, below a lax 1.0 one
    assert(idx.needsRebuild(), s"fraction ${idx.appendedFraction} should cue rebuild")
    assert(!idx.needsRebuild(threshold = 1.0))
    // a fresh handle (another process in the serving pipeline) sees the
    // same signal — it lives in _meta, not the handle
    assert(IvfIndex.load(spark, dir).needsRebuild())
  }

  test("maintain: drift past threshold refits from own postings, resets counters, recall holds") {
    val dir = Files.createTempDirectory("graft-ivfm-").toString
    val n = emb.count()
    val built = (n * 2) / 5 // 40% built, 60% appended → fraction 1.5 > 0.5
    IvfIndex.build(spark, dir, emb.filter($"vec_id" < built), "vec_id", "embedding",
      nLists = 8)
    IvfIndex.load(spark, dir).append(emb.filter($"vec_id" >= built),
      "vec_id", "embedding")

    // below-threshold maintain is a no-op (no job, no gen flip)
    assert(!IvfIndex.maintain(spark, dir, threshold = 2.0))
    assert(IvfIndex.load(spark, dir).gen.isEmpty)

    assert(IvfIndex.maintain(spark, dir), "drifted index must rebuild")
    val idx = IvfIndex.load(spark, dir)
    // counters reset: the rebuilt corpus IS the built corpus now
    assert(idx.rows == n && idx.builtRows == n)
    assert(idx.appendedFraction == 0.0 && !idx.needsRebuild())
    // generation flipped; the superseded root-layout postings are reclaimed
    assert(idx.gen.contains(0))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/assignments")))
    assert(Files.exists(java.nio.file.Paths.get(s"$dir/gen-0/assignments")))

    // rebuild sourced the index's own postings: every id survives exactly once
    val stored = spark.read.parquet(s"$dir/gen-0/assignments")
    assert(stored.count() == n)
    assert(stored.select("id").distinct().count() == n)

    // the refit quantizer recalls appended-region queries and still prunes
    val qid = built + 3
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", queryId = qid, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = idx.topKById(emb, "vec_id", "embedding", qid, 10, nProbe = 4)
      .select("id").as[Long].collect().toSet
    val recall = exact.intersect(got).size.toDouble / 10
    assert(recall >= 0.5, s"post-rebuild recall too low: $recall")
    val qvec = emb.filter($"vec_id" === qid)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val scanned = idx.probeScan(idx.probeLists(qvec, 4))
    val partFilters = scanned.queryExecution.executedPlan
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head.metadata.getOrElse("PartitionFilters", "")
    assert(partFilters.contains("list"), s"no partition filter on list: $partFilters")
    assert(scanned.count() < n)

    // a second drift cycle stacks generations: gen-0 → gen-1, gen-0 reclaimed
    idx.append(emb.select(($"vec_id" + 100000).as("vec_id"), $"embedding"),
      "vec_id", "embedding")
    assert(IvfIndex.maintain(spark, dir))
    assert(IvfIndex.load(spark, dir).gen.contains(1))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/gen-0")))
    assert(spark.read.parquet(s"$dir/gen-1/assignments").count() == 2 * n)

    // a handle loaded BEFORE that rebuild is now stale (gen 0, live gen 1):
    // appending through it would write into the reclaimed generation and
    // bump the shared rows counter with vectors no reader serves — it must
    // refuse (the PqIndex.append contract), and the live index must be
    // untouched by the attempt
    val rowsBefore = IvfIndex.load(spark, dir).rows
    val ex = intercept[IllegalStateException] {
      idx.append(emb.limit(5), "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("stale handle"), ex.getMessage)
    assert(IvfIndex.load(spark, dir).rows == rowsBefore)
    assert(spark.read.parquet(s"$dir/gen-1/assignments").count() == 2 * n)
  }

  test("IvfMaintainCli: flag parsing, drift-gated rebuild, --force") {
    import graft.IvfMaintainCli
    val dir = Files.createTempDirectory("graft-ivfcli-").toString
    val n = emb.count()
    IvfIndex.build(spark, dir, emb.filter($"vec_id" < n / 2), "vec_id", "embedding",
      nLists = 8)
    intercept[IvfMaintainCli.CliUsageError](IvfMaintainCli.run(spark, Array.empty))
    intercept[IvfMaintainCli.CliUsageError](
      IvfMaintainCli.run(spark, Array(dir, "--threshold", "x")))
    intercept[IvfMaintainCli.CliUsageError](
      IvfMaintainCli.run(spark, Array(dir, "--bogus")))
    // fresh index: below threshold → no rebuild
    assert(!IvfMaintainCli.run(spark, Array(dir)))
    // --force rebuilds regardless and re-partitions per --nlists
    assert(IvfMaintainCli.run(spark, Array(dir, "--force", "--nlists", "4")))
    val idx = IvfIndex.load(spark, dir)
    assert(idx.nLists == 4 && idx.gen.contains(0) && idx.builtRows == n / 2)
    // drift past threshold → the plain invocation rebuilds
    idx.append(emb.filter($"vec_id" >= n / 2), "vec_id", "embedding")
    assert(IvfMaintainCli.run(spark, Array(dir, "--threshold", "0.5")))
    assert(IvfIndex.load(spark, dir).builtRows == n)
  }
}
