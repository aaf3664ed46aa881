package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract queries over `/root/testdata/sf*` (TESTDATA.md): each is a
  * named DataFrame program whose result must hash-match the DuckDB oracle SQL
  * in [[graft.SparkEntry.oracleSql]] (driver correctness gate).
  *
  * Two families:
  *  - crawl-operator analogs (SURVEY.md §2 shapes — anti-join dedup, per-key
  *    top-k scheduling, politeness windows, explode, sort, agg, union) over
  *    the relational tables;
  *  - training-data pipeline ops (dedup exact/MinHash/SimHash/Jaccard,
  *    similarity search, text analysis) over `documents`/`embeddings`.
  *
  * Parity rules that make exact hash-matching possible against DuckDB:
  *  - integer arithmetic everywhere hashes are involved (md5-hex → BIGINT);
  *  - double sums only over index-ordered sequential folds (`aggregate` /
  *    `list_dot_product` both fold left in element order → bit-equal);
  *  - every output deterministically ordered and rounded where FP appears.
  */
object ContractQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---- crawl-operator analogs -----------------------------------------

  /** A1/A4-style aggregate block (hash-agg with partial aggregation). */
  def q1PricingAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** J1 frontier∖visited analog: anti-join. */
  def q2AntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select("o_orderkey")
      .join(t(spark, dir, "lineitem").select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_anti")
      .orderBy("o_orderkey")

  /** O1 per-host batch top-k analog: row_number ≤ k per group. */
  def q3TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** O4 politeness schedule analog: per-user slot numbering × delay. */
  def q4PolitenessSchedule(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("slot", row_number().over(w).cast("long"))
      .withColumn("fetch_offset_ms", (col("slot") - 1).cast("long") * 100L)
      .select("user_id", "event_id", "slot", "fetch_offset_ms")
      .orderBy("user_id", "slot")
  }

  /** G1 link-explosion analog: token explode + frequency top-50. */
  def q5ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(50)

  /** J2/J4 star join (broadcast dims) + rollup-style agg. */
  def q6StarJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("r_name")

  /** A2/A3 side-output counters analog: per-event-type conditional counts. */
  def q7Counters(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_neg"),
        round(sum("value"), 4).as("total_value"))
      .orderBy("event_type")

  /** U1 visited-union analog: union + distinct. */
  def q8UnionDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .unionByName(t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  /** Stateful stream analog: gap-based sessionization (lag + running sum). */
  def q9Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 3600L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  // ---- training-data pipeline ops (documents) -------------------------

  /** 60-bit integer content hash both engines compute identically:
    * first 15 hex digits of md5. */
  private val H = "cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)"

  /** Exact dedup: group documents by content hash, keep min doc_id. */
  def q10DedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_id"))
      .orderBy("fingerprint")

  private val MinhashP = 1000000007L
  private val MinhashAB = Seq((370248451L, 55229L), (414606793L, 94727L),
    (173961109L, 13873L), (873191981L, 71339L))

  /** MinHash signatures (4 permutations) + 2 LSH band ids per document. */
  def q11MinhashSig(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .withColumn("h", expr(H))
    val aggs = MinhashAB.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"((h % $MinhashP) * $a + $b) % $MinhashP")).as(s"m$i")
    }
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("band0", concat_ws(":", col("m0"), col("m1")))
      .withColumn("band1", concat_ws(":", col("m2"), col("m3")))
      .orderBy("doc_id")
  }

  /** LSH candidate pairs: documents sharing a MinHash band bucket. */
  def q12MinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = q11MinhashSig(spark, dir)
    val bands = sig.select(col("doc_id"), col("band0").as("band"))
      .unionByName(sig.select(col("doc_id"), col("band1").as("band")))
    val l = bands.select(col("band"), col("doc_id").as("d1"))
    val r = bands.select(col("band"), col("doc_id").as("d2"))
    l.join(r, Seq("band")).filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
      .orderBy("d1", "d2")
  }

  /** 16-bit SimHash per document over its distinct-token hash bits. */
  def q13Simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
      .withColumn("h", expr(H))
    val bitSums = (0 until 16).map(j =>
      sum(when(expr(s"(h div ${1L << j}) % 2") === 1, 1L).otherwise(-1L)).as(s"s$j"))
    val withSums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 16).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    withSums.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
  }

  /** N-gram (token-set) Jaccard similarity for near-dup pairs (doc_id<40). */
  def q14NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents").filter(col("doc_id") < 40)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val l = toks.select(col("token"), col("doc_id").as("d1"))
    val r = toks.select(col("token"), col("doc_id").as("d2"))
    val inter = l.join(r, Seq("token")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), Seq("d2"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= 0.2)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  private val EnStopwords = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with", "as", "by", "at", "an", "or")

  /** Language-ID heuristic: stopword-ratio scoring per document. */
  def q15LangId(spark: SparkSession, dir: String): DataFrame = {
    val stopList = EnStopwords.map(s => s"'$s'").mkString(", ")
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> t in ($stopList)))").cast("long"))
      .withColumn("stop_ratio",
        round(col("n_stop").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("pred_en", (col("stop_ratio") >= 0.08).cast("int"))
      .select("doc_id", "lang", "n_tokens", "n_stop", "stop_ratio", "pred_en")
      .orderBy("doc_id")
  }

  /** Quality scoring: length/token statistics per document. */
  def q16Quality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))").cast("long"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_tokens").cast("double"), 6))
      .withColumn("avg_token_len",
        round((col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double"), 6))
      .withColumn("quality_ok",
        (col("n_tokens") >= 10 && col("distinct_ratio") >= 0.3).cast("int"))
      .select("doc_id", "n_tokens", "n_distinct", "distinct_ratio", "avg_token_len", "quality_ok")
      .orderBy("doc_id")

  /** Token counting rollup by language + source. */
  def q17TokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("lang", "source")
      .agg(sum("n_tokens").as("tokens"), count(lit(1)).as("docs"),
        sum("n_chars").as("chars"))
      .orderBy("lang", "source")

  /** Document fingerprint: min polynomial hash over character 8-grams
    * (winnowing-style rolling fingerprint, integer math only). */
  def q18Fingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("fp", expr(
        """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
          |  i -> aggregate(sequence(0, 7), 0L,
          |        (acc, k) -> acc * 31L + ascii(substr(text, i + k, 1)))))""".stripMargin))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  // ---- similarity search (embeddings) ---------------------------------

  private val Dot = "aggregate(zip_with(%s, %s, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"

  /** Brute-force cosine top-k vs a query vector (ANN baseline). */
  def q19CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos", round(
        expr(Dot.format("e", "qe")) /
          (sqrt(expr(Dot.format("e", "e"))) * sqrt(expr(Dot.format("qe", "qe")))), 6))
      .select("vec_id", "cos")
      .orderBy(desc("cos"), col("vec_id"))
      .limit(10)
  }

  /** Random-hyperplane LSH bucketing (integer plane weights → exact parity):
    * 8-bit signature per vector + bucket population. */
  def q20LshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val planeDot = (p: Int) =>
      expr(s"aggregate(zip_with(e, sequence(0, 63), " +
        s"(x, d) -> x * cast(($p * 1000003 + d * 7919) % 2001 - 1000 as double)), " +
        "cast(0 as double), (acc, v) -> acc + v)")
    val sig = (0 until 8).map(p =>
      when(planeDot(p) > 0, lit(1L << p)).otherwise(0L)).reduce(_ + _)
    val withSig = emb.select(col("vec_id"), sig.as("sig"))
    val buckets = withSig.groupBy("sig").agg(count(lit(1)).as("bucket_n"))
    withSig.join(buckets, Seq("sig"))
      .select("vec_id", "sig", "bucket_n")
      .orderBy("vec_id")
  }

  /** Embedding-cosine near-duplicate pairs within a bounded id range. */
  def q21NearDupCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val l = emb.select(col("vec_id").as("v1"), col("e").as("e1"))
    val r = emb.select(col("vec_id").as("v2"), col("e").as("e2"))
    l.crossJoin(r).filter(col("v1") < col("v2"))
      .withColumn("cos", round(
        expr(Dot.format("e1", "e2")) /
          (sqrt(expr(Dot.format("e1", "e1"))) * sqrt(expr(Dot.format("e2", "e2")))), 6))
      .filter(col("cos") >= 0.35)
      .select("v1", "v2", "cos")
      .orderBy("v1", "v2")
  }

  // ---- URL expressions over constructed columns -----------------------

  /** C1 canonicalization exercised against an independently constructed
    * oracle: messy URL (uppercase scheme/host, default port, unsorted dup
    * query keys, fragment) must normalize to the clean form. */
  def q22UrlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.UrlFunctions
    t(spark, dir, "documents")
      .select(col("doc_id"),
        concat(lit("HTTP://"), upper(col("source")), lit(".COM:80/p/"), col("doc_id"),
          lit("?b=2&a=1&a=9#frag")).as("messy"))
      .withColumn("url", UrlFunctions.normalize_url(col("messy")))
      .withColumn("host", UrlFunctions.url_host(col("url")))
      .select("doc_id", "url", "host")
      .orderBy("doc_id")
  }
}
