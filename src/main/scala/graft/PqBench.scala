package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Receipt for product quantization ([[graft.ops.PqIndex]]): the two
  * costs that dominate PQ at fleet scale, timed at local[8] and local[32]
  * (ScalingBench methodology — interleaved passes, best wall per cell)
  * over a generated embedding corpus:
  *
  *  - ENCODE: the ingest-side map-only projection (every vector pays
  *    m × k × dsub multiply-adds exactly once, then is 8 bytes forever);
  *  - ADC QUERY: sequential `topK` scans of the code table — the
  *    serving-side cost, m byte-lookups per row per query.
  *
  * Code checksums and the top-k id lists are asserted identical across
  * every cell. Appends the measured table to `BENCH.md`. */
object PqBench {
  def main(args: Array[String]): Unit = {
    val vecs = sys.env.getOrElse("SPARK_GRAFT_PQ_VECS", "2000000").toLong
    val dim = 64; val m = 8; val k = 256
    val corpus = Files.createTempDirectory("pq-corpus-").toString
    val indexDir = Files.createTempDirectory("pq-index-").toString

    import graft.sources.SiteGraph.mix
    def fresh(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", "/dev/shm/spark-scratch")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }
    def drop(s: SparkSession): Unit = {
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    locally { // generate + fit + persist ONCE; the cells read the artifacts
      val s = fresh(32)
      import s.implicits._
      // deterministic clustered corpus: 256 latent centers (so the fitted
      // codebooks quantize structure, not uniform noise), integer-derived
      // doubles — exactly reproducible on every read
      s.range(0, vecs, 1, 64).map { id =>
        val c = (id % 256).toInt
        val v = Array.tabulate(dim) { d =>
          ((mix(11L, c.toLong, d.toLong) % 1000) / 100.0) +
            ((mix(13L, id, d.toLong) % 100) / 1000.0)
        }
        (id, v.toSeq)
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(corpus)
      val t0 = System.nanoTime()
      val (_, excluded) = graft.ops.PqIndex.build(s, indexDir,
        s.read.parquet(corpus), "vec_id", "embedding", m = m, k = k,
        fitSample = 50000L)
      val fitSecs = (System.nanoTime() - t0) / 1e9
      require(excluded == 0, s"fixture premise broken: $excluded unencodable")
      println(f"[pq-bench] fit+encode+persist (32 cores): $fitSecs%.1f s")
      drop(s)
    }

    val queries = (0 until 16).map(q => Array.tabulate(dim) { d =>
      ((mix(11L, q.toLong * 17 % 256, d.toLong) % 1000) / 100.0)
    })

    val cells = Seq(8, 32, 8, 32).map { cpus =>
      val spark = fresh(cpus)
      val idx = graft.ops.PqIndex.load(spark, indexDir)
      val emb = spark.read.parquet(corpus)
      // ENCODE pass: the full corpus through the codegen'd projection;
      // the checksum both forces every row and pins cross-cell equality
      val t0 = System.nanoTime()
      val sums = emb
        .select(idx.codebook.encodeCol(col("embedding")).as("c"))
        // bit_xor: order-independent and overflow-free under ANSI mode
        .selectExpr("bit_xor(xxhash64(c)) AS chk", "count(c) AS n").head()
      val encSecs = (System.nanoTime() - t0) / 1e9
      val chk = (sums.getLong(0), sums.getLong(1))
      // ADC QUERY pass: sequential top-10 scans of the code table
      val t1 = System.nanoTime()
      val tops = queries.map(q =>
        idx.topK(q, 10).collect().map(_.getLong(0)).toSeq)
      val adcSecs = (System.nanoTime() - t1) / 1e9
      drop(spark)
      (cpus, encSecs, adcSecs, chk, tops)
    }
    require(cells.map(_._4).distinct.size == 1,
      s"code checksums diverge: ${cells.map(_._4).distinct}")
    require(cells.map(_._5).distinct.size == 1, "top-k ids diverge across cells")
    val n = cells.head._4._2
    def best(cpus: Int) = {
      val cs = cells.filter(_._1 == cpus)
      (cs.map(_._2).min, cs.map(_._3).min)
    }
    val ((e8, a8), (e32, a32)) = (best(8), best(32))
    val eff = (n / e32) / (n / e8) / 4.0
    val qps32 = queries.size / a32
    println(f"""{"metric":"pq_encode_vecs_per_sec32","value":${n / e32}%.1f,"unit":"vecs/s","vecs":$n,"dim":$dim,"m":$m,"k":$k,"enc_sec8":$e8%.2f,"enc_sec32":$e32%.2f,"adc_sec8":$a8%.2f,"adc_sec32":$a32%.2f,"adc_queries_per_sec32":$qps32%.2f,"eff_8_to_32":$eff%.3f}""")
    val md =
      f"""
         |### Product quantization (`PqIndex`, encode + ADC serving)
         |
         |$n%d × $dim-dim generated vectors (256 latent centers), m=$m
         |subspaces × k=$k codes — each vector stored as $m bytes (${dim * 8 / m}%d×
         |smaller than the float64 arrays scanned here, 32× vs float32 at
         |equal width). Code checksums and all 16 query results asserted
         |identical across every cell.
         |
         || cell | encode (s) | 16 ADC top-10 queries (s) | encode vecs/s |
         ||---|---|---|---|
         || local[8]  | $e8%.2f | $a8%.2f | ${n / e8}%.1f |
         || local[32] | $e32%.2f | $a32%.2f | ${n / e32}%.1f |
         |
         |Encode strong-scaling efficiency 8→32: **$eff%.3f**. Encode is a
         |map-only codegen'd projection (`pq_encode`, codebook
         |plan-embedded) — per-node cost at fleet scale is exactly this
         |cell's arithmetic, paid once per ingested vector. ADC queries scan
         |the CODE table only ($m bytes/row; ${qps32}%.1f queries/s at 32
         |cores including per-job overhead) — the float vectors never load,
         |which is the entire point: at 100 TB of embeddings the code table
         |is ~${m}%d/${dim * 8}%d of the corpus and sits in cluster page
         |cache while exact rerank touches floats for the shortlist only.
         |""".stripMargin
    Files.write(Paths.get("BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
