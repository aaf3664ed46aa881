package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import org.apache.spark.sql.types._
import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}

/** Cuckoo filter over 64-bit keys — the north rule's alternative seen-set
  * representation ("partitioned Bloom/cuckoo-filter URL-seen set",
  * BASELINE.json `north_rule`). Standard partial-key cuckoo hashing
  * (Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14):
  * buckets of 4 sixteen-bit fingerprints; a key's two candidate buckets are
  * `i1 = h(key)` and `i2 = i1 XOR h'(fp)`, so any stored (bucket, fp) entry
  * can be relocated — and merged into another filter — without the original
  * key. Advantages over Bloom for a crawl seen-set: ~same space at 1% FPP
  * with better locality (two cache lines per probe instead of k scattered
  * bits), and support for `delete` (re-crawl / TTL'd frontier entries can
  * retire URLs from the filter, which a Bloom filter cannot do).
  *
  * Correctness invariant (the crawl engine depends on it): NO false
  * negatives, ever. The eligibility path routes "probe = false" rows around
  * the visited anti-join entirely, so a false negative would re-schedule a
  * visited URL and break exactness. Three mechanisms preserve the invariant
  * under pressure:
  *   - a fixed-size stash absorbs the homeless entry when an insert exceeds
  *     the eviction budget;
  *   - if the stash itself fills, the filter flips to `saturated` and every
  *     probe returns true — it degrades to "no prefilter" (correct, merely
  *     slower), never to a false negative;
  *   - the eviction walk is deterministic (no RNG). Unlike Bloom bit-ORs the
  *     physical layout still depends on insertion order (shuffle-read order
  *     may differ between task attempts), so two attempts of one bucket task
  *     may write different BYTES — but both files represent the same key SET,
  *     and the StateFs commit protocol publishes exactly one complete file,
  *     so either attempt's rename winning is correct.
  */
final class CuckooFilter private (
    val nBuckets: Int, // power of two
    private val table: Array[Short], // nBuckets * SlotsPerBucket slots; 0 = empty
    private val stash: Array[Long], // packed (bucket << 16 | fp), -1 = empty
    private var stashSize: Int,
    private var saturatedFlag: Boolean) extends Serializable {
  import CuckooFilter._

  def this(nBuckets: Int) =
    this(nBuckets, new Array[Short](nBuckets * CuckooFilter.SlotsPerBucket),
      Array.fill[Long](CuckooFilter.StashSlots)(-1L), 0, false)

  private val mask = nBuckets - 1
  require((nBuckets & mask) == 0 && nBuckets > 0, s"nBuckets must be a power of two: $nBuckets")

  def saturated: Boolean = saturatedFlag

  // 64->64 mix (splitmix64 finalizer) — decorrelates bucket index from the
  // raw key, which for urlHash is itself an xxhash64 but may be any long here
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 16-bit nonzero fingerprint (0 marks an empty slot). */
  private def fingerprint(h: Long): Short = {
    val f = (mix(h) >>> 48).toInt & 0xffff
    (if (f == 0) 1 else f).toShort
  }

  private def index1(h: Long): Int = (mix(h * 0x517cc1b727220a95L) & mask).toInt

  /** Partner bucket: XOR with a mix of the fingerprint — self-inverse, so
    * `altIndex(altIndex(i, fp), fp) == i` and entries relocate both ways. */
  private def altIndex(i: Int, fp: Short): Int =
    (i ^ (mix(fp.toLong & 0xffffL) & mask)).toInt & mask

  private def bucketHas(b: Int, fp: Short): Boolean = {
    val base = b * SlotsPerBucket
    table(base) == fp || table(base + 1) == fp ||
      table(base + 2) == fp || table(base + 3) == fp
  }

  private def tryPlace(b: Int, fp: Short): Boolean = {
    val base = b * SlotsPerBucket
    var s = 0
    while (s < SlotsPerBucket) {
      if (table(base + s) == 0) { table(base + s) = fp; return true }
      s += 1
    }
    false
  }

  private def stashHas(b: Int, fp: Short): Boolean = {
    val packed = pack(b, fp)
    var i = 0
    while (i < stashSize) { if (stash(i) == packed) return true; i += 1 }
    false
  }

  /** Insert an entry already reduced to (bucket, fingerprint) — the merge
    * primitive: a stored entry carries enough information to re-insert. */
  def insertEntry(b0: Int, fp0: Short): Unit = {
    if (saturatedFlag) return
    if (tryPlace(b0, fp0) || tryPlace(altIndex(b0, fp0), fp0)) return
    // deterministic eviction walk: kick slot (n mod 4) of the current bucket
    var b = altIndex(b0, fp0)
    var fp = fp0
    var n = 0
    while (n < MaxKicks) {
      val base = b * SlotsPerBucket
      val slot = base + (n & (SlotsPerBucket - 1))
      val victim = table(slot)
      table(slot) = fp
      fp = victim
      b = altIndex(b, fp)
      if (tryPlace(b, fp)) return
      n += 1
    }
    // homeless entry -> stash; full stash -> saturated (probe-all-true)
    if (stashSize < stash.length) { stash(stashSize) = pack(b, fp); stashSize += 1 }
    else saturatedFlag = true
  }

  def putLong(h: Long): Unit = insertEntry(index1(h), fingerprint(h))

  def mightContainLong(h: Long): Boolean = {
    if (saturatedFlag) return true
    val fp = fingerprint(h)
    val i1 = index1(h)
    if (bucketHas(i1, fp)) return true
    val i2 = altIndex(i1, fp)
    bucketHas(i2, fp) || stashHas(i1, fp) || stashHas(i2, fp)
  }

  /** Remove one stored copy of `h`'s fingerprint (true iff one was removed).
    * Only delete keys that were actually inserted — deleting a never-inserted
    * key may evict another key's colliding fingerprint (the standard cuckoo
    * filter contract). No-op once saturated (membership is no longer
    * per-entry). */
  def delete(h: Long): Boolean = {
    if (saturatedFlag) return false
    val fp = fingerprint(h)
    val i1 = index1(h)
    val i2 = altIndex(i1, fp)
    var bi = 0
    while (bi < 2) {
      val base = (if (bi == 0) i1 else i2) * SlotsPerBucket
      var s = 0
      while (s < SlotsPerBucket) {
        if (table(base + s) == fp) { table(base + s) = 0; return true }
        s += 1
      }
      bi += 1
    }
    var i = 0
    while (i < stashSize) {
      val b = (stash(i) >>> 16).toInt
      if ((stash(i) & 0xffffL).toInt == (fp & 0xffff) && (b == i1 || b == i2)) {
        stashSize -= 1
        stash(i) = stash(stashSize)
        stash(stashSize) = -1L
        return true
      }
      i += 1
    }
    false
  }

  /** Fold `other`'s entries into this filter (same nBuckets required) —
    * relocatable (bucket, fp) entries make cuckoo filters mergeable the same
    * way Bloom bit-ORs are, at the cost of possible saturation when the
    * combined load exceeds capacity (which degrades, never corrupts). */
  def mergeInPlace(other: CuckooFilter): this.type = {
    require(other.nBuckets == nBuckets,
      s"cuckoo merge requires equal bucket counts: $nBuckets vs ${other.nBuckets}")
    if (other.saturatedFlag) { saturatedFlag = true; return this }
    var slot = 0
    while (slot < other.table.length && !saturatedFlag) {
      val fp = other.table(slot)
      if (fp != 0) insertEntry(slot / SlotsPerBucket, fp)
      slot += 1
    }
    var i = 0
    while (i < other.stashSize && !saturatedFlag) {
      insertEntry((other.stash(i) >>> 16).toInt, (other.stash(i) & 0xffffL).toShort)
      i += 1
    }
    this
  }

  def writeTo(out: OutputStream): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(Magic)
    d.writeInt(nBuckets)
    d.writeBoolean(saturatedFlag)
    d.writeInt(stashSize)
    var i = 0
    while (i < stashSize) { d.writeLong(stash(i)); i += 1 }
    var s = 0
    while (s < table.length) { d.writeShort(table(s).toInt); s += 1 }
    d.flush()
  }
}

object CuckooFilter {
  private[functions] val SlotsPerBucket = 4
  private[functions] val MaxKicks = 500
  private[functions] val StashSlots = 64
  private val Magic = 0x47434b46 // "GCKF"

  private def pack(b: Int, fp: Short): Long = (b.toLong << 16) | (fp.toLong & 0xffffL)

  /** Sized for `expectedItems` at ~84% slot load (the practical cuckoo load
    * ceiling for 4-slot buckets with a stash); 16-bit fingerprints give an
    * FPP of ~2*4/2^16 ≈ 0.012% per probe — well under the 1% the Bloom path
    * defaults to, at ~2.4 bytes/key. */
  def create(expectedItems: Long): CuckooFilter = {
    val slots = math.max(SlotsPerBucket.toLong * 2, math.ceil(expectedItems / 0.84).toLong)
    val buckets = java.lang.Long.highestOneBit(
      math.max(2L, (slots + SlotsPerBucket - 1) / SlotsPerBucket) * 2 - 1)
    // 2^28 buckets × 4 slots = 2^30 shorts (2 GiB, the JVM array ceiling is
    // the real bound: nBuckets * SlotsPerBucket must stay an Int) ≈ 900M
    // keys per bucket file — far past where the partitioned store should
    // have split further anyway
    require(buckets <= (1L << 28),
      s"cuckoo filter too large ($expectedItems expected items): " +
        "raise the partitioned store's bucket count instead")
    new CuckooFilter(buckets.toInt)
  }

  def readFrom(in: InputStream): CuckooFilter = {
    val d = new DataInputStream(in)
    require(d.readInt() == Magic, "not a graft cuckoo filter stream")
    val nBuckets = d.readInt()
    val saturated = d.readBoolean()
    val stashSize = d.readInt()
    val stash = Array.fill[Long](math.max(StashSlots, stashSize))(-1L)
    var i = 0
    while (i < stashSize) { stash(i) = d.readLong(); i += 1 }
    val table = new Array[Short](nBuckets * SlotsPerBucket)
    var s = 0
    while (s < table.length) { table(s) = d.readShort(); s += 1 }
    new CuckooFilter(nBuckets, table, stash, stashSize, saturated)
  }
}

/** Partitioned cuckoo seen-filter snapshot store — same layout contract as
  * [[BloomBucketStore]] (`<dir>/cuckoobuckets/round=K/bucket=B.bin`, missing
  * bucket file = nothing in that bucket was ever visited), selected with
  * `CrawlConfig.seenFilterKind = "cuckoo"`.
  */
object CuckooBucketStore {
  private val buckets =
    new BucketCache[CuckooFilter]("cuckoobuckets", new CuckooFilter(2),
      CuckooFilter.readFrom)

  def path(dir: String, round: Int, bucket: Int): String =
    buckets.path(dir, round, bucket)

  /** See [[BucketCache.invalidate]]. */
  def invalidate(dir: String): Unit = buckets.invalidate(dir)

  def load(sfs: graft.io.StateFs, dir: String, round: Int, bucket: Int): CuckooFilter =
    buckets.load(sfs, dir, round, bucket)
}

/** Task-side probe handle for one snapshot round of the cuckoo bucket store
  * (mirror of [[BloomBucketHandle]]). */
final class CuckooBucketHandle(val dir: String, val round: Int, val nBuckets: Int,
    val sfs: graft.io.StateFs = graft.io.StateFs.local)
    extends Serializable {
  @transient private lazy val local =
    new java.util.concurrent.atomic.AtomicReferenceArray[CuckooFilter](nBuckets)
  def probe(h: Long): Boolean = {
    val b = java.lang.Math.floorMod(h, nBuckets.toLong).toInt
    var f = local.get(b)
    if (f == null) {
      f = CuckooBucketStore.load(sfs, dir, round, b)
      local.set(b, f)
    }
    f.mightContainLong(h)
  }
}

/** Codegen'd probe against the partitioned cuckoo store — same fusion
  * property as [[BloomBucketMightContain]] (the probe stays inside
  * WholeStageCodegen on the eligibility filter). */
case class CuckooBucketMightContain(child: Expression, handle: CuckooBucketHandle)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cuckoo_bucket_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT key, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    handle.probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuckooBuckets", handle, classOf[CuckooBucketHandle].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CuckooBucketMightContain =
    copy(child = newChild)
}

object CuckooFunctions {
  /** True iff `key` might be in the partitioned cuckoo filter store. */
  def cuckoo_bucket_might_contain(key: Column, handle: CuckooBucketHandle): Column =
    CB.column(CuckooBucketMightContain(CB.expression(key), handle))
}
