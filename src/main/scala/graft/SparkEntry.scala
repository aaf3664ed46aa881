package graft

import graft.model.CrawlConfig
import graft.operators.FrontierCrawler
import graft.queries.ContractQueries
import graft.sources.SiteGraph
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named DataFrame program per operator family; each has
  * an ANSI-SQL oracle in [[oracleSql]] (DuckDB dialect) producing the same
  * columns/rows — the DuckDB compare is the correctness gate. Queries whose
  * semantics DuckDB cannot replay (engine-specific crawl loop, xxhash-keyed
  * ops) are covered by the ScalaTest parity suite instead.
  */
object SparkEntry {

  /** Flagship: end-to-end frontier crawl over a deterministic synthetic web
    * graph — the reference's whole pipeline (verify → rounds of
    * fetch/extract/dedup → sorted found relation). Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = SiteGraph.localPages(SiteGraph.GraphParams(
      nHosts = 1, pagesPerHost = 40, linksPerPage = 4,
      redirectFrac = 0.05, errorFrac = 0.05, seed = 42L))
    val seed = pages.find(_.status == 200).get.url
    val out = new FrontierCrawler(spark, pages.toDS(),
      CrawlConfig(maxConcurrent = 20, bloomEnabled = false)).crawl(seed)
    out.found.select("url").orderBy("url")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_agg" -> ContractQueries.q1PricingAgg _,
    "q2_anti_join" -> ContractQueries.q2AntiJoin _,
    "q3_topk_per_group" -> ContractQueries.q3TopkPerGroup _,
    "q4_politeness_schedule" -> ContractQueries.q4PolitenessSchedule _,
    "q5_explode_tokens" -> ContractQueries.q5ExplodeTokens _,
    "q6_star_join" -> ContractQueries.q6StarJoin _,
    "q7_counters" -> ContractQueries.q7Counters _,
    "q8_union_distinct" -> ContractQueries.q8UnionDistinct _,
    "q9_sessionize" -> ContractQueries.q9Sessionize _,
    "q10_dedup_exact" -> ContractQueries.q10DedupExact _,
    "q11_minhash_sig" -> ContractQueries.q11MinhashSig _,
    "q12_minhash_pairs" -> ContractQueries.q12MinhashPairs _,
    "q13_simhash" -> ContractQueries.q13Simhash _,
    "q14_ngram_jaccard" -> ContractQueries.q14NgramJaccard _,
    "q15_langid" -> ContractQueries.q15LangId _,
    "q16_quality" -> ContractQueries.q16Quality _,
    "q17_token_count" -> ContractQueries.q17TokenCount _,
    "q18_fingerprint" -> ContractQueries.q18Fingerprint _,
    "q19_cosine_topk" -> ContractQueries.q19CosineTopk _,
    "q20_lsh_buckets" -> ContractQueries.q20LshBuckets _,
    "q21_near_dup_cosine" -> ContractQueries.q21NearDupCosine _,
    "q22_url_normalize" -> ContractQueries.q22UrlNormalize _,
    "q23_brand_revenue" -> ContractQueries.q23BrandRevenue _,
    "q24_bpe_tokens" -> ContractQueries.q24BpeTokens _,
    "q25_image_roundtrip" -> ContractQueries.q25ImageRoundtrip _,
    "q26_jaccard_capped" -> ContractQueries.q26JaccardCapped _,
    "q27_minhash_capped" -> ContractQueries.q27MinhashCapped _,
    "q28_hot_tokens" -> ContractQueries.q28HotTokens _,
    "q29_simhash_near_dup" -> ContractQueries.q29SimhashNearDup _,
    "q30_bigram_jaccard" -> ContractQueries.q30BigramJaccard _,
    "q31_hot_bigrams" -> ContractQueries.q31HotBigrams _,
    "q32_dedup_components" -> ContractQueries.q32DedupComponents _,
    "q33_repetition" -> ContractQueries.q33Repetition _,
    "q34_pii_redact" -> ContractQueries.q34PiiRedact _,
    "q35_phash_components" -> ContractQueries.q35PhashComponents _,
    "q36_semantic_dedup" -> ContractQueries.q36SemanticDedup _,
    "q37_mixture_sample" -> ContractQueries.q37MixtureSample _,
    "q38_decontamination" -> ContractQueries.q38Decontamination _,
    "q39_sequence_packing" -> ContractQueries.q39SequencePacking _,
    "q40_link_rank" -> ContractQueries.q40LinkRank _,
    "q41_incremental_dedup" -> ContractQueries.q41IncrementalDedup _,
    "q42_incremental_minhash" -> ContractQueries.q42IncrementalMinhash _,
    "q43_robots_allowed" -> ContractQueries.q43RobotsAllowed _,
    "q44_repetition_stats" -> ContractQueries.q44RepetitionStats _,
    "q45_trap_patterns" -> ContractQueries.q45TrapPatterns _,
    "q46_sitemap_locs" -> ContractQueries.q46SitemapLocs _,
    "q47_image_quality" -> ContractQueries.q47ImageQuality _,
    "q48_caption_gates" -> ContractQueries.q48CaptionGates _,
    "q49_aspect_batches" -> ContractQueries.q49AspectBatches _,
    "q50_keep_best_dup" -> ContractQueries.q50KeepBestDup _,
    "q51_format_audit" -> ContractQueries.q51FormatAudit _,
    "q52_sitemap_images" -> ContractQueries.q52SitemapImages _,
    "q53_verified_phash_dup" -> ContractQueries.q53VerifiedPhashDup _,
    "q54_merge_upsert" -> ContractQueries.q54MergeUpsert _,
    "q55_sitemap_recency" -> ContractQueries.q55SitemapRecency _,
    "q56_training_resample" -> ContractQueries.q56TrainingResample _,
    "q57_pair_alignment" -> ContractQueries.q57PairAlignment _,
    "q58_duplicate_spans" -> ContractQueries.q58DuplicateSpans _,
    "q59_stats_skipping" -> ContractQueries.q59StatsSkipping _,
    "q60_dhash" -> ContractQueries.q60DHash _,
    "q61_bloom_lookup" -> ContractQueries.q61BloomLookup _,
    "q62_byte_exact" -> ContractQueries.q62ByteExact _,
    "q63_leakage_split" -> ContractQueries.q63LeakageSplit _,
    "q64_caption_cap" -> ContractQueries.q64CaptionCap _,
    "q65_image_decontam" -> ContractQueries.q65ImageDecontam _)

  // DuckDB-dialect oracles. Shared fragments:
  private val H = "('0x' || substr(md5(token), 1, 15))::BIGINT"
  private val P = "1000000007"

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_price,
        | round(avg(l_discount), 6) AS avg_disc, count(*) AS n_rows
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_anti_join" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        |ORDER BY o_orderkey""".stripMargin,

    "q3_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q4_politeness_schedule" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS slot,
        |  (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) * 100 AS fetch_offset_ms
        |FROM events ORDER BY user_id, slot""".stripMargin,

    "q5_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "q6_star_join" ->
      """SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q7_counters" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT AS n_neg,
        |  round(sum(value), 4) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q8_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q9_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL
        |           OR date_diff('second', prev_ts, ts) > 3600 THEN 1 ELSE 0 END AS new_session
        |  FROM g)
        |SELECT user_id,
        |  max(session_id)::BIGINT AS n_sessions, count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM s)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q10_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, count(*) AS n_copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,

    "q11_minhash_sig" -> {
      val ab = Seq((370248451L, 55229L), (414606793L, 94727L),
        (173961109L, 13873L), (873191981L, 71339L))
      val mins = ab.zipWithIndex.map { case ((a, b), i) =>
        s"min(((h % $P) * $a + $b) % $P) AS m$i" }.mkString(",\n  ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |hs AS (SELECT doc_id, $H AS h FROM toks)
         |SELECT doc_id, $mins,
         |  m0 || ':' || m1 AS band0, m2 || ':' || m3 AS band1
         |FROM hs GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q23_brand_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q24_bpe_tokens" ->
      """SELECT lang,
        |  sum(len(string_split(text, ' ')))::BIGINT AS ws_tokens,
        |  sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')))::BIGINT AS bpe_tokens,
        |  count(*) AS docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q12_minhash_pairs" -> {
      val ab = Seq((370248451L, 55229L), (414606793L, 94727L),
        (173961109L, 13873L), (873191981L, 71339L))
      val mins = ab.zipWithIndex.map { case ((a, b), i) =>
        s"min(((h % $P) * $a + $b) % $P) AS m$i" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id < 1000),
         |hs AS (SELECT doc_id, $H AS h FROM toks),
         |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, m0 || ':' || m1 AS band FROM sig
         |  UNION ALL SELECT doc_id, m2 || ':' || m3 AS band FROM sig)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin
    },

    "q13_simhash" -> {
      val sums = (0 until 16).map(j =>
        s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(",\n  ")
      val sig = (0 until 16).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END").mkString(" + ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |hs AS (SELECT doc_id, $H AS h FROM toks),
         |sums AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id)
         |SELECT doc_id, $sig AS simhash FROM sums ORDER BY doc_id""".stripMargin
    },

    "q14_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 40),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) >= 0.2
        |ORDER BY d1, d2""".stripMargin,

    "q15_langid" ->
      """SELECT doc_id, lang,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the','a','of','and','to','in','is','on','for','with','as','by','at','an','or')))::BIGINT AS n_stop,
        |  round(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the','a','of','and','to','in','is','on','for','with','as','by','at','an','or')))::DOUBLE
        |    / len(string_split(text, ' '))::DOUBLE, 6) AS stop_ratio,
        |  CASE WHEN round(len(list_filter(string_split(text, ' '),
        |    t -> t IN ('the','a','of','and','to','in','is','on','for','with','as','by','at','an','or')))::DOUBLE
        |    / len(string_split(text, ' '))::DOUBLE, 6) >= 0.08 THEN 1 ELSE 0 END AS pred_en
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q16_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  len(list_distinct(string_split(text, ' ')))::BIGINT AS n_distinct,
        |  round(len(list_distinct(string_split(text, ' ')))::DOUBLE
        |    / len(string_split(text, ' '))::DOUBLE, 6) AS distinct_ratio,
        |  round((n_chars - (len(string_split(text, ' ')) - 1))::DOUBLE
        |    / len(string_split(text, ' '))::DOUBLE, 6) AS avg_token_len,
        |  CASE WHEN len(string_split(text, ' ')) >= 10
        |        AND len(list_distinct(string_split(text, ' ')))::DOUBLE
        |          / len(string_split(text, ' '))::DOUBLE >= 0.3 THEN 1 ELSE 0 END AS quality_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q17_token_count" ->
      """SELECT lang, source,
        |  sum(len(string_split(text, ' ')))::BIGINT AS tokens,
        |  count(*) AS docs, sum(n_chars)::BIGINT AS chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q18_fingerprint" ->
      """SELECT doc_id,
        |  list_min(list_transform(range(1, greatest(len(text) - 7, 1) + 1),
        |    i -> list_reduce(list_transform(range(0, 8),
        |           k -> ascii(substr(text, i + k, 1))::BIGINT),
        |         (acc, v) -> acc * 31 + v))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q19_cosine_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id,
        |  round(list_dot_product(ee, qe)
        |    / (sqrt(list_dot_product(ee, ee)) * sqrt(list_dot_product(qe, qe))), 6) AS cos
        |FROM e, q ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    "q20_lsh_buckets" -> {
      val planes = (0 until 8).map(p =>
        s"""CASE WHEN list_dot_product(e, list_transform(range(0, 64),
           |  d -> (($p * 1000003 + d * 7919) % 2001 - 1000)::DOUBLE)) > 0
           |  THEN ${1L << p}::BIGINT ELSE 0::BIGINT END""".stripMargin).mkString(" + ")
      s"""WITH s AS (
         |  SELECT vec_id, $planes AS sig
         |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)),
         |b AS (SELECT sig, count(*) AS bucket_n FROM s GROUP BY sig)
         |SELECT s.vec_id, s.sig, b.bucket_n FROM s JOIN b ON s.sig = b.sig
         |ORDER BY s.vec_id""".stripMargin
    },

    "q21_near_dup_cosine" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
        |           FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(list_dot_product(a.ee, b.ee)
        |    / (sqrt(list_dot_product(a.ee, a.ee)) * sqrt(list_dot_product(b.ee, b.ee))), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.ee, b.ee)
        |    / (sqrt(list_dot_product(a.ee, a.ee)) * sqrt(list_dot_product(b.ee, b.ee))), 6) >= 0.35
        |ORDER BY v1, v2""".stripMargin,

    "q25_image_roundtrip" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 8 = 7 THEN 7 ELSE doc_id END AS dup_of,
        |  true AS w_ok, true AS psnr_ok, 64 AS feat_dim, true AS feat_nonzero
        |FROM documents WHERE doc_id < 24 ORDER BY doc_id""".stripMargin,

    "q26_jaccard_capped" ->
      """WITH toks0 AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 40),
        |keep AS (
        |  SELECT token FROM toks0 GROUP BY token HAVING count(*) <= 20),
        |toks AS (SELECT t.doc_id, t.token FROM toks0 t JOIN keep k ON t.token = k.token),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) >= 0.2
        |ORDER BY d1, d2""".stripMargin,

    "q27_minhash_capped" -> {
      val ab = Seq((370248451L, 55229L), (414606793L, 94727L),
        (173961109L, 13873L), (873191981L, 71339L))
      val mins = ab.zipWithIndex.map { case ((a, b), i) =>
        s"min(((h % $P) * $a + $b) % $P) AS m$i" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id < 1000),
         |hs AS (SELECT doc_id, $H AS h FROM toks),
         |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, m0 || ':' || m1 AS band FROM sig
         |  UNION ALL SELECT doc_id, m2 || ':' || m3 AS band FROM sig),
         |keepband AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 50),
         |kept AS (SELECT b.doc_id, b.band FROM bands b JOIN keepband k ON b.band = k.band)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM kept a JOIN kept b ON a.band = b.band AND a.doc_id < b.doc_id
         |ORDER BY d1, d2""".stripMargin
    },

    "q28_hot_tokens" ->
      """SELECT token, count(*) AS doc_freq FROM (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE doc_id < 40)
        |GROUP BY token HAVING count(*) > 20 ORDER BY token""".stripMargin,

    "q31_hot_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 120),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS token
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i))
        |SELECT token, count(*) AS doc_freq FROM sh
        |GROUP BY token HAVING count(*) > 2 ORDER BY token""".stripMargin,

    "q30_bigram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 120),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS token
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) >= 0.05
        |ORDER BY d1, d2""".stripMargin,

    "q29_simhash_near_dup" -> {
      val sums = (0 until 16).map(j =>
        s"sum(CASE WHEN (h // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(",\n  ")
      val sig = (0 until 16).map(j =>
        s"CASE WHEN s$j > 0 THEN ${1L << j}::BIGINT ELSE 0::BIGINT END").mkString(" + ")
      val blocks = (0 until 4).map(b =>
        s"SELECT doc_id, simhash, $b AS blk, (simhash // ${1L << (4 * b)}) % 16 AS bval FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id < 300),
         |hs AS (SELECT doc_id, $H AS h FROM toks),
         |sums AS (SELECT doc_id, $sums FROM hs GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sig AS simhash FROM sums),
         |blocks AS ($blocks)
         |SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2,
         |  bit_count(xor(l.simhash, r.simhash))::INTEGER AS hamming
         |FROM blocks l JOIN blocks r
         |  ON l.blk = r.blk AND l.bval = r.bval AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin
    },

    "q22_url_normalize" ->
      """SELECT doc_id,
        |  'http://' || lower(source) || '.com/p/' || doc_id || '?a=9&b=2' AS url,
        |  lower(source) || '.com' AS host
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q32_dedup_components" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |          FROM documents WHERE doc_id < 1000),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS token
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT d1, d2 FROM inter
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2
        |  WHERE round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) >= 0.2),
        |edges AS (SELECT d1 AS u, d2 AS v FROM pairs UNION SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT u AS id FROM edges),
        |comp AS (
        |  WITH RECURSIVE reach(id, r) AS (
        |    SELECT id, id FROM nodes
        |    UNION
        |    SELECT rr.id, e.v FROM reach rr JOIN edges e ON e.u = rr.r)
        |  SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
        |  CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS is_kept
        |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        |WHERE d.doc_id < 1000
        |ORDER BY d.doc_id""".stripMargin,

    "q33_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |top1 AS (SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS n_tokens
        |         FROM tf GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bgram
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i)),
        |bf AS (SELECT doc_id, bgram, count(*) AS c FROM bg GROUP BY 1, 2),
        |top2 AS (SELECT doc_id, max(c) AS top_bc, sum(c)::BIGINT AS n_bigrams
        |         FROM bf GROUP BY doc_id)
        |SELECT t1.doc_id, t1.n_tokens,
        |  round(t1.top_c::DOUBLE / t1.n_tokens::DOUBLE, 6) AS top_token_frac,
        |  t2.n_bigrams,
        |  round(t2.top_bc::DOUBLE / t2.n_bigrams::DOUBLE, 6) AS top_bigram_frac,
        |  CASE WHEN round(t1.top_c::DOUBLE / t1.n_tokens::DOUBLE, 6) <= 0.12
        |        AND (t2.doc_id IS NULL
        |             OR round(t2.top_bc::DOUBLE / t2.n_bigrams::DOUBLE, 6) <= 0.08)
        |       THEN 1 ELSE 0 END AS repetition_ok
        |FROM top1 t1 LEFT JOIN top2 t2 ON t1.doc_id = t2.doc_id
        |ORDER BY t1.doc_id""".stripMargin,

    "q34_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id, text || ' contact ' || source || doc_id || '@mail.example' ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' cc bot' || doc_id || '@spam.example' ELSE '' END ||
        |    ' call 555-01' || (doc_id % 90 + 10) ||
        |    ' host 10.0.' || (doc_id % 256) || '.7' AS ptext
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(ptext, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(s1, '555-[0-9]{4}'))::BIGINT AS n_phones,
        |  len(regexp_extract_all(s2, '([0-9]{1,3}\.){3}[0-9]{1,3}'))::BIGINT AS n_ips,
        |  md5(regexp_replace(s2,
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS redacted_md5
        |FROM (
        |  SELECT doc_id, ptext, s1,
        |    regexp_replace(s1, '555-[0-9]{4}', '<PHONE>', 'g') AS s2
        |  FROM (
        |    SELECT doc_id, ptext,
        |      regexp_replace(ptext,
        |        '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS s1
        |    FROM p))
        |ORDER BY doc_id""".stripMargin,

    "q35_phash_components" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 8 = 7 THEN 7 ELSE doc_id END AS component,
        |  CASE WHEN doc_id % 8 = 7 AND doc_id <> 7 THEN 0 ELSE 1 END AS is_kept
        |FROM documents WHERE doc_id < 48 ORDER BY doc_id""".stripMargin,

    "q36_semantic_dedup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ee
        |           FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.ee, b.ee)
        |    / (sqrt(list_dot_product(a.ee, a.ee)) * sqrt(list_dot_product(b.ee, b.ee))), 6) >= 0.35),
        |edges AS (SELECT v1 AS u, v2 AS v FROM pairs UNION SELECT v2, v1 FROM pairs),
        |nodes AS (SELECT DISTINCT u AS id FROM edges),
        |comp AS (
        |  WITH RECURSIVE reach(id, r) AS (
        |    SELECT id, id FROM nodes
        |    UNION
        |    SELECT rr.id, e2.v FROM reach rr JOIN edges e2 ON e2.u = rr.r)
        |  SELECT id, min(r) AS component FROM reach GROUP BY id)
        |SELECT e.vec_id, coalesce(c.component, e.vec_id) AS component,
        |  CASE WHEN coalesce(c.component, e.vec_id) = e.vec_id THEN 1 ELSE 0 END AS is_kept
        |FROM e LEFT JOIN comp c ON c.id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q37_mixture_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT % 10000 AS bucket,
        |    (CASE WHEN source = 'src0' THEN 0.2
        |          WHEN source = 'src1' THEN 0.8
        |          ELSE 0.5 END)::DOUBLE AS keep_rate
        |  FROM documents)
        |SELECT doc_id, source, bucket, keep_rate FROM h
        |WHERE bucket < keep_rate * 10000
        |ORDER BY doc_id""".stripMargin,

    "q38_decontamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS token
        |  FROM t, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS r(i)),
        |ev AS (SELECT doc_id AS eval_id, token FROM sh WHERE doc_id % 50 = 0),
        |co AS (SELECT doc_id, token FROM sh WHERE doc_id % 50 <> 0),
        |shared AS (
        |  SELECT co.doc_id, ev.eval_id, count(*) AS n_shared
        |  FROM co JOIN ev USING (token)
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT doc_id, max(n_shared) AS max_shared, count(*) AS n_eval_hits
        |FROM shared GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q39_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' '))::BIGINT AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT // 512 AS pack_id
        |FROM d ORDER BY doc_id""".stripMargin,

    "q40_link_rank" -> {
      // fixed-point integer PageRank, 5 unrolled iterations (base term
      // 150000 = scale·(1−0.85); all divisions on non-negative ints, so
      // DuckDB's floor // ≡ Spark's truncating div)
      val head =
        """WITH n AS (SELECT count(*) AS cnt FROM documents),
          |edges0 AS (
          |  SELECT doc_id AS src,
          |    (doc_id * 7 + j * 13 + 1) % (SELECT cnt FROM n) AS dst
          |  FROM documents, unnest([0, 1, 2]) AS t(j)),
          |edges AS (SELECT DISTINCT src, dst FROM edges0 WHERE src <> dst),
          |nodes AS (SELECT DISTINCT src AS id FROM edges
          |          UNION SELECT dst FROM edges),
          |outdeg AS (SELECT src AS id, count(*) AS deg FROM edges GROUP BY src),
          |r0 AS (SELECT id, 1000000::BIGINT AS rank FROM nodes)""".stripMargin
      val steps = (1 to 5).map(i =>
        s""",
           |c$i AS (
           |  SELECT e.dst AS id, sum(r.rank // o.deg)::BIGINT AS contrib
           |  FROM edges e
           |  JOIN r${i - 1} r ON r.id = e.src
           |  JOIN outdeg o ON o.id = e.src
           |  GROUP BY e.dst),
           |r$i AS (
           |  SELECT nd.id,
           |    (150000 + (850000 * coalesce(c.contrib, 0)) // 1000000)::BIGINT AS rank
           |  FROM nodes nd LEFT JOIN c$i c ON c.id = nd.id)""".stripMargin).mkString
      head + steps + "\nSELECT id, rank FROM r5 ORDER BY id"
    },

    "q41_incremental_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |          FROM documents WHERE doc_id < 1000),
        |sh AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS token
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.token = b.token AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) >= 0.2
        |  AND (d1 < 100 OR d2 < 100)
        |ORDER BY d1, d2""".stripMargin,

    "q42_incremental_minhash" -> {
      val ab = Seq((370248451L, 55229L), (414606793L, 94727L),
        (173961109L, 13873L), (873191981L, 71339L))
      val mins = ab.zipWithIndex.map { case ((a, b), i) =>
        s"min(((h % $P) * $a + $b) % $P) AS m$i" }.mkString(", ")
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE doc_id < 1000),
         |hs AS (SELECT doc_id, $H AS h FROM toks),
         |sig AS (SELECT doc_id, $mins FROM hs GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, m0 || ':' || m1 AS band FROM sig
         |  UNION ALL SELECT doc_id, m2 || ':' || m3 AS band FROM sig)
         |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
         |WHERE a.doc_id < 100 OR b.doc_id < 100
         |ORDER BY d1, d2""".stripMargin
    },

    "q43_robots_allowed" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '/p' || (doc_id % 7) || '/' || (doc_id % 3) || '/' AS path,
        |    ['/p' || (doc_id % 5) || '/',
        |     '/p' || (doc_id % 7) || '/' || (doc_id % 4),
        |     '/q' || (doc_id % 3)] AS dis,
        |    ['/p' || (doc_id % 7),
        |     '/p' || (doc_id % 5) || '/' || (doc_id % 3)] AS allow
        |  FROM documents)
        |SELECT doc_id,
        |  (coalesce(list_max(list_transform(
        |      list_filter(dis, p -> starts_with(path, p)), p -> length(p))), 0)
        |   <= coalesce(list_max(list_transform(
        |      list_filter(allow, p -> starts_with(path, p)), p -> length(p))), 0)
        |  )::INT AS allowed
        |FROM m ORDER BY doc_id""".stripMargin,

    "q44_repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
        |tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |top1 AS (SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS n_tokens
        |         FROM tf GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bgram
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS r(i)),
        |bf AS (SELECT doc_id, bgram, count(*) AS c FROM bg GROUP BY 1, 2),
        |top2 AS (SELECT doc_id, max(c) AS top_bc, sum(c)::BIGINT AS n_bigrams
        |         FROM bf GROUP BY doc_id)
        |SELECT t1.doc_id, t1.n_tokens,
        |  round(t1.top_c::DOUBLE / t1.n_tokens::DOUBLE, 6) AS top_token_frac,
        |  t2.n_bigrams,
        |  round(t2.top_bc::DOUBLE / t2.n_bigrams::DOUBLE, 6) AS top_bigram_frac
        |FROM top1 t1 LEFT JOIN top2 t2 ON t1.doc_id = t2.doc_id
        |ORDER BY t1.doc_id""".stripMargin,

    // closed-form pattern reconstruction: digit runs (item id) and the
    // 32-hex md5 segment collapse to '#', query values drop to keys
    "q45_trap_patterns" ->
      """SELECT 'h' || (doc_id % 5) || '.com/' ||
        |       chr(CAST(97 + doc_id % 7 AS INT)) ||
        |       '/item#/#?session&page' AS pattern,
        |       count(*) AS n_urls
        |FROM documents
        |GROUP BY 1 ORDER BY pattern""".stripMargin,

    // closed-form loc reconstruction: one plain + one CDATA loc per doc
    "q46_sitemap_locs" ->
      """SELECT loc, count(*) AS n FROM (
        |  SELECT 'http://s.com/p' || doc_id AS loc FROM documents
        |  UNION ALL
        |  SELECT 'http://s.com/q' || (doc_id % 7) FROM documents)
        |GROUP BY loc ORDER BY loc""".stripMargin,

    // closed-form stats: flat gray image (even ids) vs exact two-tone
    // checkerboard (odd ids); PNG lossless ⇒ every value exact
    "q47_image_quality" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(16 + doc_id % 8 AS INT) ELSE 16 END AS width,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(12 + doc_id % 5 AS INT) ELSE 12 END AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id * 37 % 256 AS DOUBLE) ELSE 127.5 END AS mean_luma,
        |  CASE WHEN doc_id % 2 = 0 THEN 0.0 ELSE 127.5 END AS stddev_luma,
        |  CASE WHEN doc_id % 2 = 0 THEN 0.0 ELSE 1.0 END AS entropy_bits
        |FROM documents WHERE doc_id < 192 ORDER BY doc_id""".stripMargin,

    // the oracle REBUILDS the captions with its own string functions and
    // re-derives every gate in SQL — independent recomputation of the
    // caption-curation column program
    "q48_caption_gates" ->
      """WITH caps AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN ''
        |         WHEN doc_id % 10 = 1 THEN repeat('spam ', 130)
        |         WHEN doc_id % 10 = 2 THEN 'x'
        |         WHEN doc_id % 10 = 3 THEN '1 2 3 4 5 6'
        |         ELSE 'a photo of item ' || doc_id END AS caption
        |  FROM documents WHERE doc_id < 500),
        |g AS (
        |  SELECT doc_id, caption,
        |    CASE WHEN length(trim(caption)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(caption), '\s+')) END AS n_tokens,
        |    length(regexp_replace(caption, '[^A-Za-z]', '', 'g')) AS letters,
        |    length(regexp_replace(caption, '\s', '', 'g')) AS nonspace
        |  FROM caps)
        |SELECT doc_id, n_tokens,
        |  COALESCE(
        |    CASE WHEN length(trim(caption)) = 0 THEN 'caption_missing'
        |         WHEN n_tokens < 3 THEN 'caption_too_short'
        |         WHEN n_tokens > 128 THEN 'caption_too_long'
        |         WHEN letters * 1.0 / nonspace < 0.5 THEN 'caption_low_alpha'
        |         END, 'kept') AS reason
        |FROM g ORDER BY doc_id""".stripMargin,

    // sizes in closed form (the Spark side DECODES real PNGs to get them),
    // then the same integer milli-aspect banding + window arithmetic
    "q49_aspect_batches" ->
      """WITH m AS (
        |  SELECT doc_id, 16 + doc_id % 48 AS w, 12 + (doc_id * 7) % 36 AS h
        |  FROM documents WHERE doc_id < 192),
        |b AS (
        |  SELECT doc_id,
        |    CASE WHEN (w*1000)//h < 800 THEN 'tall'
        |         WHEN (w*1000)//h < 1250 THEN 'square'
        |         WHEN (w*1000)//h < 2000 THEN 'wide'
        |         ELSE 'ultrawide' END AS band
        |  FROM m),
        |r AS (
        |  SELECT doc_id, band,
        |    row_number() OVER (PARTITION BY band ORDER BY doc_id) - 1 AS rn
        |  FROM b)
        |SELECT doc_id, band, CAST(0 AS INT) AS shard,
        |  rn // 8 AS batch_ix, rn % 8 AS slot
        |FROM r ORDER BY doc_id""".stripMargin,

    // planted chains of four with strictly growing resolution: components
    // collapse to the chain head, keep-best lands on id%4 == 3
    "q50_keep_best_dup" ->
      """SELECT doc_id, (doc_id // 4) * 4 AS component,
        |  CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END AS is_kept
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    // the Spark side sniffs REAL encoder magic bytes; the oracle states
    // container + verdict in closed form from the id ladder
    "q51_format_audit" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'jpeg'
        |    WHEN 3 THEN 'gif' WHEN 4 THEN 'bmp' WHEN 5 THEN 'webp'
        |    ELSE 'unknown' END AS sniffed,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 2 THEN 'format_mismatch' WHEN 6 THEN 'unknown_container'
        |    ELSE 'kept' END AS reason
        |FROM documents WHERE doc_id < 210 ORDER BY doc_id""".stripMargin,

    // the oracle REBUILDS the (url, caption) pair relation with its own
    // string functions and replays the min-non-null-caption grouping
    "q52_sitemap_images" ->
      """WITH pairs AS (
        |  SELECT 'http://img.com/i' || doc_id || '.jpg' AS url,
        |         'cap ' || (doc_id % 9) AS caption
        |  FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT 'http://img.com/j' || doc_id || '.png', NULL
        |  FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT 'http://img.com/shared.jpg', 'cap ' || (doc_id % 9)
        |  FROM documents WHERE doc_id < 300 AND doc_id % 50 = 0)
        |SELECT url, min(caption) AS caption FROM pairs
        |GROUP BY url ORDER BY url""".stripMargin,

    // the Spark side phash-buckets real 1-pixel-edited copies (plus
    // phash-colliding distinct gradients) and verifies survivors on
    // decoded pixels; the oracle states the true duplicate relation
    // (consecutive id pairs) in closed form
    "q53_verified_phash_dup" ->
      """SELECT doc_id AS d1, doc_id + 1 AS d2
        |FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
        |ORDER BY d1""".stripMargin,

    // relational replay of the copy-on-write upsert: staged dedup keeps
    // the max-quality arrival per key, matched keys upgrade only on
    // strictly better quality, unmatched keys insert
    "q54_merge_upsert" ->
      """WITH base AS (
        |  SELECT doc_id AS k, CAST(50 AS BIGINT) AS q, 'old' || doc_id AS v
        |  FROM documents WHERE doc_id < 200),
        |staged AS (
        |  SELECT doc_id % 250 AS k, doc_id * 17 % 100 AS q, 'new' || doc_id AS v
        |  FROM documents WHERE doc_id < 500),
        |best AS (
        |  SELECT k, q, v FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY q DESC, v DESC) AS rn
        |    FROM staged) WHERE rn = 1)
        |SELECT COALESCE(b.k, s.k) AS k,
        |  CASE WHEN b.k IS NULL OR s.q > b.q THEN s.q ELSE b.q END AS q,
        |  CASE WHEN b.k IS NULL OR s.q > b.q THEN s.v ELSE b.v END AS v
        |FROM base b FULL OUTER JOIN best s ON b.k = s.k
        |ORDER BY k""".stripMargin,

    // closed-form recency: every lastmod instant is doc_id arithmetic over
    // a fixed epoch base, so the oracle recomputes claim counts and
    // freshest epochs without parsing any datetime string
    "q55_sitemap_recency" ->
      """WITH e AS (
        |  SELECT 'http://s.com/p' || (doc_id % 100) AS url,
        |    CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN 1767225600 + (doc_id % 50) * 86400
        |      WHEN 1 THEN 1767225600 + doc_id * 3600
        |      ELSE NULL END AS epoch
        |  FROM documents
        |  UNION ALL
        |  SELECT 'http://s.com/q' || (doc_id % 7), NULL FROM documents)
        |SELECT url, count(*) AS claims, count(epoch) AS with_lastmod,
        |  max(epoch) AS freshest_epoch
        |FROM e GROUP BY url ORDER BY url""".stripMargin,

    // the Spark side resamples REAL PNGs through the pinned floor-division
    // point sample; the oracle replays that sampling arithmetic per output
    // pixel — the mean over 32 gray values is an exact dyadic double
    "q56_training_resample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS src_w,
        |         CAST(6 + doc_id % 3 AS INT) AS src_h
        |  FROM documents WHERE doc_id < 192),
        |g AS (
        |  SELECT m.doc_id, m.src_w, m.src_h,
        |    (((x.x * m.src_w) // 8) * 37 + ((y.y * m.src_h) // 4) * 11
        |      + m.doc_id * 7) % 256 AS v
        |  FROM m, generate_series(0, 7) x(x), generate_series(0, 3) y(y))
        |SELECT doc_id, src_w, src_h, SUM(v) / 32.0 AS mean_luma
        |FROM g GROUP BY doc_id, src_w, src_h ORDER BY doc_id""".stripMargin,

    // CLIP-score-style alignment gate: the oracle replays the cosine with
    // DuckDB's list_dot_product over the same double-cast embeddings (the
    // q36-proven fold parity) and re-derives the gate verdict
    "q57_pair_alignment" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ee FROM embeddings),
        |img AS (SELECT vec_id // 2 AS pair_id, ee AS ie FROM e WHERE vec_id % 2 = 0),
        |cap AS (SELECT (vec_id - 1) // 2 AS pair_id, ee AS ce FROM e WHERE vec_id % 2 = 1),
        |s AS (
        |  SELECT pair_id,
        |    round(list_dot_product(ie, ce)
        |      / (sqrt(list_dot_product(ie, ie)) * sqrt(list_dot_product(ce, ce))), 6)
        |      AS alignment
        |  FROM img JOIN cap USING (pair_id))
        |SELECT pair_id, alignment,
        |  CASE WHEN alignment >= 0.05 THEN 1 ELSE 0 END AS is_aligned
        |FROM s ORDER BY pair_id""".stripMargin,

    // span-level exact-substring dedup: windows with positions, corpus-wide
    // occurrence counts, covered token positions, token-level reconstruction
    "q58_duplicate_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS win
        |      FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS r(i)),
        |d AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
        |cov AS (SELECT w.doc_id, w.pos FROM w JOIN d USING (win)),
        |rem AS (SELECT DISTINCT c.doc_id, j
        |        FROM cov c, unnest(range(c.pos, c.pos + 8)) AS r(j)),
        |tok AS (SELECT doc_id, j, toks[j] AS tok
        |        FROM t, unnest(range(1, len(toks) + 1)) AS r(j)),
        |kept AS (SELECT tok.doc_id, tok.j, tok.tok FROM tok
        |         LEFT JOIN rem ON tok.doc_id = rem.doc_id AND tok.j = rem.j
        |         WHERE rem.j IS NULL),
        |clean AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
        |          array_to_string(list(tok ORDER BY j), ' ') AS clean_text
        |          FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens,
        |  (len(t.toks) - coalesce(c.n_kept, 0))::BIGINT AS n_removed,
        |  coalesce(c.clean_text, '') AS clean_text
        |FROM t LEFT JOIN clean c USING (doc_id) ORDER BY doc_id""".stripMargin,

    // stats-pruned range reads replayed relationally: the upsert moves the
    // upgraded rows' stats values, then three range predicates
    "q59_stats_skipping" ->
      """WITH d AS (
        |  SELECT doc_id AS k,
        |    CASE WHEN doc_id < 50 THEN doc_id * 2 + 1000
        |         ELSE doc_id * 2 END AS r
        |  FROM documents WHERE doc_id < 300)
        |SELECT 'up' AS part, k, r FROM d WHERE r BETWEEN 1000 AND 2000
        |UNION ALL SELECT 'mid', k, r FROM d WHERE r BETWEEN 450 AND 550
        |UNION ALL SELECT 'low', k, r FROM d WHERE r BETWEEN 100 AND 160
        |ORDER BY part, k""".stripMargin,

    // the Spark side decodes REAL 9×8 PNGs through the pinned area-resample
    // + integer-luma dhash kernel; the oracle reassembles the signed 64-bit
    // hash from the generator arithmetic, bit by bit (bit 63 via the signed
    // minimum so the sum stays in BIGINT range)
    "q60_dhash" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 256),
        |b AS (
        |  SELECT doc_id, (y.y * 8 + x.x) AS k,
        |    CASE WHEN ((doc_id*7 + (x.x+1)*13 + y.y*29) % 256)
        |            > ((doc_id*7 + x.x*13 + y.y*29) % 256)
        |         THEN 1 ELSE 0 END AS bit
        |  FROM ids, generate_series(0, 7) x(x), generate_series(0, 7) y(y))
        |SELECT doc_id,
        |  SUM(CASE WHEN bit = 1 THEN
        |        CASE WHEN k = 63 THEN -9223372036854775808
        |             ELSE (1::BIGINT << k) END
        |      ELSE 0 END)::BIGINT AS dhash
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Bloom-pruned point lookups off the on-disk table: the oracle replays
    // two appends + WHEN-NOT-MATCHED-INSERT (stored keys keep their rows)
    // and the three lookups relationally
    "q61_bloom_lookup" ->
      """WITH base AS (
        |  SELECT doc_id AS k, 'a' || doc_id AS v FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id, 'b' || doc_id FROM documents
        |  WHERE doc_id >= 100 AND doc_id < 200
        |  UNION ALL
        |  SELECT doc_id, 'c' || doc_id FROM documents
        |  WHERE doc_id >= 200 AND doc_id < 250)
        |SELECT 'one' AS part, k, v FROM base WHERE k IN (7, 42, 99)
        |UNION ALL SELECT 'two', k, v FROM base WHERE k IN (120, 180, 205)
        |UNION ALL SELECT 'three', k, v FROM base WHERE k IN (160, 999999)
        |ORDER BY part, k""".stripMargin,

    // byte-exact dedup winners: the Spark side groups REAL encoded PNG
    // bytes by sha-256; pixels are a pure function of doc_id % 25, so the
    // oracle replays group membership (and the min-id winner + copy
    // count) from the generator arithmetic alone
    "q62_byte_exact" ->
      """SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies
        |FROM documents WHERE doc_id < 400
        |GROUP BY doc_id % 25
        |ORDER BY doc_id""".stripMargin,

    "q63_leakage_split" ->
      """SELECT doc_id, comp AS component,
        |  CASE WHEN b < 8000 THEN 'train'
        |       WHEN b < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, comp,
        |    ('0x' || substr(md5('split:' || comp), 1, 15))::BIGINT % 10000 AS b
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 8 = 7 THEN 7 ELSE doc_id END AS comp
        |        FROM documents WHERE doc_id < 48))
        |ORDER BY doc_id""".stripMargin,

    "q64_caption_cap" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 < 2 THEN 'stock photo'
        |         ELSE substr(text, 1, 40) END AS caption
        |  FROM documents WHERE doc_id < 500),
        |r AS (
        |  SELECT doc_id, caption,
        |    count(*) OVER (PARTITION BY caption) AS caption_freq,
        |    row_number() OVER (PARTITION BY caption ORDER BY doc_id) AS rk
        |  FROM p)
        |SELECT doc_id, caption, caption_freq, rk <= 3 AS kept
        |FROM r ORDER BY doc_id""".stripMargin,

    "q65_image_decontam" ->
      """WITH c AS (
        |  SELECT doc_id, doc_id * 64 AS sig
        |  FROM documents WHERE doc_id < 500),
        |e AS (
        |  SELECT 100000 + doc_id AS eid, (doc_id + 3) * 64 + doc_id % 4 AS sig
        |  FROM documents WHERE doc_id < 500 AND doc_id % 50 = 0),
        |p AS (
        |  SELECT c.doc_id, bit_count(xor(c.sig, e.sig))::BIGINT AS h
        |  FROM c CROSS JOIN e
        |  WHERE bit_count(xor(c.sig, e.sig)) <= 2)
        |SELECT doc_id, count(*) AS n_eval_hits, min(h) AS min_hamming
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
