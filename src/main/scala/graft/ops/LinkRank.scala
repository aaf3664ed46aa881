package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph authority scoring for crawl prioritization — the signal the
  * north rule's priority queue consumes: pages (or hosts) with high
  * incoming-link authority are fetched first, which is how production
  * frontiers allocate budget at web scale (OPIC/PageRank-ordered crawling).
  *
  * The rank is FIXED-POINT INTEGER PageRank: ranks live in int64 scaled by
  * `scale`, the damping factor in parts-per-million, every per-edge
  * contribution is an integer division, and every combine is an integer
  * sum. Integer addition is associative and commutative, so the result is
  * bit-identical regardless of partitioning, aggregation order, or engine —
  * floating-point PageRank cannot make that promise (sum order varies by
  * shuffle), and a priority that flickers across runs would make crawl
  * ordering irreproducible. Dangling-node mass leaks (standard
  * simplification); ranks order pages, they need not sum to 1.
  *
  * Each iteration is one shuffle-on-dst aggregation plus a broadcast-sized
  * join back to the node set — the textbook Spark PageRank shape; per-round
  * state is truncated with `localCheckpoint` like
  * [[Dedup.connectedComponents]].
  */
object LinkRank {

  /** `iterations` rounds of damped PageRank over `edges(srcCol, dstCol)`.
    * Returns `(id, rank)` for every node appearing in the edge relation,
    * rank in units of 1/`scale`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPpm: Long = 850000L,
      scale: Long = 1000000L): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    val baseTerm = (scale * (1000000L - dampingPpm)) / 1000000L
    var rank = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(outdeg.select(col("id").as("src"), col("deg")), Seq("src"))
        .select(col("dst").as("id"), expr("rank div deg").as("c"))
        .groupBy("id").agg(sum("c").as("contrib"))
      rank = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(baseTerm) +
            expr(s"($dampingPpm * coalesce(contrib, 0L)) div 1000000")).as("rank"))
        .localCheckpoint(true)
    }
    rank
  }

  /** Host-level authority from a crawled link relation, packaged as the
    * `(host, priority)` table [[graft.operators.FrontierCrawler]] consumes:
    * hosts are keyed by `xxhash64`, host→host edges come from the page→link
    * relation, and rank DESCENDING maps onto priority ASCENDING (dense,
    * 1-based) so the most authoritative host schedules first. One extra
    * shuffle beyond [[pageRank]] (the host-pair projection); the final
    * rank→priority assignment is [[denseRank]] — a DISTRIBUTED
    * range-partitioned sort, never a single-partition window, so the host
    * relation (10^7-10^8 rows) is ranked across the cluster. */
  def hostRank(links: DataFrame, srcUrlCol: String, dstUrlCol: String,
      iterations: Int = 5): DataFrame = {
    import graft.functions.UrlFunctions.url_host
    val hosts = links.select(
      url_host(col(srcUrlCol)).as("srcHost"),
      url_host(col(dstUrlCol)).as("dstHost"))
      .filter(col("srcHost") =!= col("dstHost"))
    val edges = hosts.select(
      xxhash64(col("srcHost")).as("src"), xxhash64(col("dstHost")).as("dst"))
    val names = hosts.select(col("srcHost").as("host"))
      .unionByName(hosts.select(col("dstHost").as("host"))).distinct()
      .withColumn("id", xxhash64(col("host")))
    denseRank(pageRank(edges, "src", "dst", iterations).join(names, Seq("id")))
  }

  /** Dense 1-based priority over `(host, rank)` rows, ordered by rank
    * DESCENDING with the tie broken by host name ASCENDING — the exact total
    * order the former `row_number().over(Window.orderBy(...))` produced, but
    * computed distributed: a range-partitioned `sortBy` (each partition holds
    * one contiguous key range) followed by `zipWithIndex` (one extra job for
    * per-partition offsets). No single-partition Window or Exchange exists
    * anywhere in the lineage, so ranking 10^8 hosts spreads across the
    * cluster instead of funneling through one task. Output partition count
    * equals the input's (asserted >1 in LinkRankSpec). */
  private[ops] def denseRank(hostRanks: DataFrame): DataFrame = {
    val sess = hostRanks.sparkSession
    val ranked = hostRanks.select(col("host"), col("rank")).rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy({ case (h, r) => (r, h) }, ascending = true)(
        Ordering.Tuple2(Ordering.Long.reverse, Ordering.String),
        scala.reflect.classTag[(Long, String)])
      .zipWithIndex()
      .map { case ((h, r), i) =>
        org.apache.spark.sql.Row(h, (i + 1).toInt, r) }
    sess.createDataFrame(ranked, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("priority",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
