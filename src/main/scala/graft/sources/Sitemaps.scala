package graft.sources

import graft.functions.UrlFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion (sitemaps.org): expand sitemap roots — from a seed
  * list or from robots.txt `Sitemap:` directives
  * ([[graft.operators.Robots.parse]]'s `sitemaps` column) — into a seeds
  * relation for [[graft.operators.FrontierCrawler.crawlSeeds]].
  *
  * A `<sitemapindex>` document lists child sitemaps; a `<urlset>` lists
  * page URLs; both carry them in `<loc>` elements
  * (extracted by the codegen'd `extract_sitemap_locs`). Expansion walks
  * the index nesting breadth-first up to `maxDepth` levels with a
  * seen-set anti-join per level, so self- or cross-referencing indexes
  * terminate. Per level the work is one equi-join against the pages
  * relation + one explode — at 10^10 scale each level's sitemap relation
  * is tiny next to the frontier it seeds, and nothing here is
  * driver-resident.
  */
object Sitemaps {

  /** `roots`: one `url` column of sitemap URLs. `pages`: the fetch
    * relation ([[graft.model.PageRow]] schema — the XML body rides the
    * `html` column, as any non-HTML payload does). Returns a distinct,
    * normalized `url` relation of the page locations found. A root that
    * is missing from `pages` (fetch error) or holds no parseable locs
    * contributes nothing. */
  def expand(pages: DataFrame, roots: DataFrame, maxDepth: Int = 4): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bodies = pages
      .select(normalize_url($"url").as("__smUrl"),
        coalesce($"html", lit("")).as("__body"))
    var frontier = roots.select(normalize_url($"url").as("__smUrl")).dropDuplicates()
    var seen = frontier
    var out: DataFrame = Seq.empty[String].toDF("url")
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      val fetched = frontier.join(bodies, Seq("__smUrl"))
        // index docs nest; urlset docs (and anything unmarked) yield pages
        .withColumn("__isIndex", instr(lower($"__body"), "<sitemapindex") > 0)
        .select($"__isIndex",
          explode(extract_sitemap_locs($"__body")).as("loc"))
        .select($"__isIndex", normalize_url($"loc").as("loc"))
      out = out.unionByName(
        fetched.filter(!$"__isIndex").select($"loc".as("url")))
      frontier = fetched.filter($"__isIndex")
        .select($"loc".as("__smUrl")).dropDuplicates()
        .join(seen, Seq("__smUrl"), "left_anti")
      // truncate the per-level plan: each level otherwise re-analyzes the
      // whole expansion tree (same pattern as the dedup-components loop)
      frontier = frontier.localCheckpoint(true)
      seen = seen.unionByName(frontier).localCheckpoint(true)
      depth += 1
    }
    out.dropDuplicates()
  }

  /** [[expand]] carrying each page's `<lastmod>` along: a distinct
    * `(url, lastmod)` relation where `lastmod` is the FRESHEST non-null
    * W3C-datetime string any urlset claimed for that normalized URL (ISO
    * date/datetime strings order chronologically as strings, so `max`
    * picks the freshest; NULL when no block carried one). This is the
    * source-side half of lastmod-prioritized re-crawling: feed
    * `recencyRelation` of the result to
    * [[graft.operators.CheckpointStore]]'s `expireAndRequeue` and expired
    * URLs with fresher sitemap claims are fetched first. Same per-level
    * join + explode shape as [[expand]]. */
  def expandEntries(pages: DataFrame, roots: DataFrame, maxDepth: Int = 4): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bodies = pages
      .select(normalize_url($"url").as("__smUrl"),
        coalesce($"html", lit("")).as("__body"))
    var frontier = roots.select(normalize_url($"url").as("__smUrl")).dropDuplicates()
    var seen = frontier
    var out: DataFrame = Seq.empty[(String, String)].toDF("url", "lastmod")
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      val fetched = frontier.join(bodies, Seq("__smUrl"))
        .withColumn("__isIndex", instr(lower($"__body"), "<sitemapindex") > 0)
      out = out.unionByName(
        fetched.filter(!$"__isIndex")
          .select(explode(extract_sitemap_entries($"__body")).as("e"))
          .select(normalize_url($"e.loc").as("url"), $"e.lastmod".as("lastmod")))
      frontier = fetched.filter($"__isIndex")
        .select(explode(extract_sitemap_locs($"__body")).as("loc"))
        .select(normalize_url($"loc").as("__smUrl")).dropDuplicates()
        .join(seen, Seq("__smUrl"), "left_anti")
        .localCheckpoint(true)
      seen = seen.unionByName(frontier).localCheckpoint(true)
      depth += 1
    }
    // freshest non-null claim per url (struct trick: non-null sorts above
    // null on the isNotNull flag, then max string = max ISO instant)
    out.groupBy($"url")
      .agg(max(struct($"lastmod".isNotNull.as("k"), $"lastmod")).as("m"))
      .select($"url", $"m.lastmod".as("lastmod"))
  }

  /** `(url, lastmod:timestamp)` recency relation from [[expandEntries]]
    * output — the shape `expireAndRequeue` consumes. W3C datetime admits
    * date-only and full offset forms; `try_to_timestamp` degrades anything
    * unparseable to NULL (= recency unknown) instead of failing the scan
    * under ANSI mode. Rows with NULL lastmod are kept — the consumer
    * treats them as unknown, not absent. */
  def recencyRelation(entries: DataFrame): DataFrame =
    entries.select(col("url"),
      coalesce(
        try_to_timestamp(col("lastmod")),
        try_to_timestamp(col("lastmod"), lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        try_to_timestamp(col("lastmod"), lit("yyyy-MM-dd"))).as("lastmod"))

  /** Image-pair expansion: same index walk as [[expand]], but the yield is
    * the image-sitemap extension's `<image:image>` blocks — a distinct
    * `(url, caption)` relation (caption NULL when the block carries none;
    * when the same normalized image URL appears under several captions the
    * lexicographically-least non-null caption wins, so the result is
    * deterministic under any partitioning). This is the source-side origin
    * of the payload table's image+caption pairs: feed the result to the
    * fetch pipeline and [[graft.operators.ImageWriteback.ingest]] takes the
    * fetched bytes + this caption straight into the snapshot table. Per
    * level the work is one equi-join + one explode, nothing
    * driver-resident — same 10^10-scale shape as [[expand]]. */
  def expandImages(pages: DataFrame, roots: DataFrame, maxDepth: Int = 4): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val bodies = pages
      .select(normalize_url($"url").as("__smUrl"),
        coalesce($"html", lit("")).as("__body"))
    var frontier = roots.select(normalize_url($"url").as("__smUrl")).dropDuplicates()
    var seen = frontier
    var out: DataFrame = Seq.empty[(String, String)].toDF("url", "caption")
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      val fetched = frontier.join(bodies, Seq("__smUrl"))
        .withColumn("__isIndex", instr(lower($"__body"), "<sitemapindex") > 0)
      out = out.unionByName(
        fetched.filter(!$"__isIndex")
          .select(explode(extract_sitemap_images($"__body")).as("img"))
          .select(normalize_url($"img.loc").as("url"), $"img.caption".as("caption")))
      frontier = fetched.filter($"__isIndex")
        .select(explode(extract_sitemap_locs($"__body")).as("loc"))
        .select(normalize_url($"loc").as("__smUrl")).dropDuplicates()
        .join(seen, Seq("__smUrl"), "left_anti")
        .localCheckpoint(true)
      seen = seen.unionByName(frontier).localCheckpoint(true)
      depth += 1
    }
    // one row per image URL: min non-null caption (nulls sort last via the
    // struct trick: (caption IS NULL, caption) min picks non-null first)
    out.groupBy($"url")
      .agg(min(struct($"caption".isNull.as("n"), $"caption")).as("m"))
      .select($"url", $"m.caption".as("caption"))
  }
}
