package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Single source of truth for the engine's SQL-registrable expressions —
  * consumed by both the in-driver `registerAll` helpers and the
  * spark-submit [[graft.GraftExtensions]] path, so the two deployment
  * modes cannot diverge (a function added here exists in both). */
object FunctionTable {
  final case class Fn(name: String, arity: Int, build: Seq[Expression] => Expression)

  val all: Seq[Fn] = Seq(
    Fn("normalize_url", 1, es => NormalizeUrl(es.head)),
    Fn("url_resolve", 2, es => UrlResolve(es(0), es(1))),
    Fn("url_host", 1, es => UrlHost(es.head)),
    Fn("url_path", 1, es => UrlPath(es.head)),
    Fn("url_pattern_key", 1, es => UrlPatternKey(es.head)),
    Fn("url_syntactic_valid", 1, es => UrlSyntacticValid(es.head)),
    Fn("url_security_valid", 1, es => UrlSecurityValid(es.head)),
    Fn("extract_hrefs", 1, es => ExtractHrefs(es.head)),
    Fn("extract_sitemap_locs", 1, es => ExtractSitemapLocs(es.head)),
    Fn("extract_sitemap_entries", 1, es => ExtractSitemapEntries(es.head)),
    Fn("extract_sitemap_images", 1, es => ExtractSitemapImages(es.head)),
    Fn("resolved_link_digest", 2, es => ResolvedLinkDigest(es(0), es(1))),
    Fn("text_fingerprint", 1, es => TextFingerprint(es.head)),
    Fn("repetition_stats", 1, es => RepetitionStats(es.head)),
    Fn("compression_ratio", 1, es => CompressionRatio(es.head)),
    Fn("phash64", 1, es => PHash64(es.head)),
    Fn("dhash64", 1, es => DHash64(es.head)),
    Fn("phash_canonical64", 1, es => PHashCanonical64(es.head)),
    Fn("phash_orientations", 1, es => PhashOrientations(es.head)),
    Fn("image_psnr_oriented", 2, es => ImagePsnrOriented(es(0), es(1))),
    Fn("image_hashes", 1, es => ImageHashes(es.head)),
    Fn("image_psnr", 2, es => ImagePsnr(es(0), es(1))),
    Fn("sniff_image_format", 1, es => SniffImageFormat(es.head)),
    Fn("image_stats", 1, es => ImageStats(es.head)),
    Fn("image_sig", 1, es => ImageSig(es.head)),
    Fn("image_dims", 1, es => ImageDims(es.head)),
    Fn("image_resample", 4, es => ImageResample(es(0), es(1), es(2), es(3))),
    Fn("strip_image_metadata", 1, es => StripImageMetadata(es.head)),
    Fn("array_dot", 2, es => ArrayDot(es(0), es(1))),
    Fn("array_sqdist", 2, es => ArraySqDist(es(0), es(1))),
    Fn("robots_allowed", 3, es => RobotsAllowed(es(0), es(1), es(2))))

  /** Arity-checked builder for one table entry. */
  def builder(f: Fn): Seq[Expression] => Expression = es => {
    require(es.length == f.arity, s"${f.name} expects ${f.arity} argument(s), got ${es.length}")
    f.build(es)
  }

  def byName(names: String*): Seq[Fn] = {
    val m = all.map(f => f.name -> f).toMap
    names.map(m)
  }

  /** Register `fns` into an existing session's FunctionRegistry. */
  def register(spark: SparkSession, fns: Seq[Fn] = all): Unit =
    fns.foreach(f => spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(f.name, builder(f), "built-in"))
}
