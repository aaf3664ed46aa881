package graft.functions

/** Shared load path of the partitioned seen-filter stores ([[BloomBucketStore]],
  * [[CuckooBucketStore]]): layout (`<dir>/<layout>/round=K/bucket=B.bin`,
  * missing bucket file = empty) and the JVM-wide bucket cache are
  * representation-agnostic — only filter create/serde/merge/probe differ.
  *
  * Bucket files are read through the Hadoop FileSystem API (StateFs), so the
  * snapshot lives on whatever distributed store `dir`'s scheme names — the
  * executor reading a bucket is never assumed to share a disk with the task
  * that built it.
  */
final class BucketCache[F <: AnyRef](layout: String, empty: F,
    readFrom: java.io.InputStream => F) {

  def path(dir: String, round: Int, bucket: Int): String =
    s"$dir/$layout/round=$round/bucket=$bucket.bin"

  // JVM-wide so concurrent tasks on one executor share each loaded bucket;
  // keyed by (dir, bucket), replaced when a newer snapshot round is
  // requested (older rounds are never probed again)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Int, F)]()

  /** Drop this JVM's cached buckets for `dir` — called after an in-place
    * snapshot modification (expiry delete). Other executors' caches roll
    * over at the next snapshot round; until then they serve the
    * pre-modification filter, which is a superset (false positives only —
    * safe). */
  def invalidate(dir: String): Unit = {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next()._1 == dir) it.remove()
  }

  def load(sfs: graft.io.StateFs, dir: String, round: Int, bucket: Int): F = {
    val key = (dir, bucket)
    val cur = cache.get(key)
    if (cur != null && cur._1 == round) return cur._2
    val pp = path(dir, round, bucket)
    val f =
      if (sfs.exists(pp)) {
        val in = new java.io.BufferedInputStream(sfs.open(pp))
        try readFrom(in) finally in.close()
      } else empty
    cache.put(key, (round, f))
    f
  }
}
