package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** The cuckoo-filter seen-set representation (north rule: "partitioned
  * Bloom/cuckoo-filter URL-seen set"). The crawl engine's exactness depends
  * on one property above all: NO false negatives, under any load — so that
  * is tested exhaustively, including past the saturation point.
  */
class CuckooFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keys(n: Int, seed: Long = 7L): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x
    }
  }

  test("no false negatives at high load; FPP well under the Bloom default") {
    val f = CuckooFilter.create(100000L)
    val in = keys(90000)
    in.foreach(f.putLong)
    assert(!f.saturated, "filter saturated below its design load")
    in.foreach(h => assert(f.mightContainLong(h), s"false negative: $h"))
    val out = keys(100000, seed = 999L).filterNot(in.toSet)
    val fp = out.count(f.mightContainLong)
    // 16-bit fingerprints: expected FPP ~ 0.012%; assert an order of
    // magnitude of slack against unlucky draws, still 10x under Bloom's 1%
    assert(fp.toDouble / out.length < 0.001, s"FPP too high: $fp/${out.length}")
  }

  test("serialization roundtrip preserves every probe answer") {
    val f = CuckooFilter.create(5000L)
    val in = keys(4000, seed = 42L)
    in.foreach(f.putLong)
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    val g = CuckooFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
    assert(g.nBuckets == f.nBuckets)
    keys(20000, seed = 5L).foreach(h =>
      assert(g.mightContainLong(h) == f.mightContainLong(h), s"probe drift: $h"))
    in.foreach(h => assert(g.mightContainLong(h)))
  }

  test("mergeInPlace folds another filter's key set in") {
    val a = CuckooFilter.create(10000L)
    val b = CuckooFilter.create(10000L)
    val ka = keys(3000, seed = 1L)
    val kb = keys(3000, seed = 2L)
    ka.foreach(a.putLong)
    kb.foreach(b.putLong)
    a.mergeInPlace(b)
    (ka ++ kb).foreach(h => assert(a.mightContainLong(h), s"lost in merge: $h"))
    intercept[IllegalArgumentException] {
      a.mergeInPlace(CuckooFilter.create(100000L))
    }
  }

  test("delete removes inserted keys without harming the rest") {
    val f = CuckooFilter.create(10000L)
    val stay = keys(2000, seed = 11L)
    val drop = keys(2000, seed = 22L).filterNot(stay.toSet)
    stay.foreach(f.putLong)
    drop.foreach(f.putLong)
    drop.foreach(h => assert(f.delete(h), s"delete failed for inserted key $h"))
    // the invariant: deletes never create false negatives for remaining keys
    stay.foreach(h => assert(f.mightContainLong(h), s"delete harmed $h"))
    // and most deleted keys are genuinely gone (collisions may retain a few)
    val still = drop.count(f.mightContainLong)
    assert(still.toDouble / drop.length < 0.01, s"deleted keys still present: $still")
  }

  test("overload degrades to saturated (probe-all-true), never a false negative") {
    val f = CuckooFilter.create(256L)
    val in = keys(5000, seed = 77L)
    in.foreach(f.putLong)
    assert(f.saturated, "2000% overload must saturate")
    in.foreach(h => assert(f.mightContainLong(h)))
    keys(100, seed = 3L).foreach(h => assert(f.mightContainLong(h)))
    // saturation survives serialization
    val bos = new ByteArrayOutputStream()
    f.writeTo(bos)
    val g = CuckooFilter.readFrom(new ByteArrayInputStream(bos.toByteArray))
    assert(g.saturated)
    // and infects merges (a merged saturated bucket must not resurrect
    // per-entry membership)
    val h2 = CuckooFilter.create(256L)
    h2.mergeInPlace(g)
    assert(h2.saturated)
  }

  test("cuckoo bucket probe stays inside WholeStageCodegen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cuckoo-wsc-").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(xxhash64($"doc_id").as("h"))
    val some = docs.limit(10).collect().map(_.getLong(0))
    val n = 4
    (0 until n).foreach { b =>
      val f = CuckooFilter.create(1024L)
      some.filter(h => Math.floorMod(h, n.toLong) == b).foreach(f.putLong)
      val p = CuckooBucketStore.path(dir, 0, b)
      graft.io.StateFs.local.writeAtomic(p)(out => f.writeTo(out))
    }
    val handle = new CuckooBucketHandle(dir, 0, n)
    val df = docs.filter(!CuckooFunctions.cuckoo_bucket_might_contain($"h", handle))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan)
    assert(df.count() > 0)
    // and the probes answer: none of the inserted keys survive the NOT filter
    val survivors = df.collect().map(_.getLong(0)).toSet
    some.foreach(h => assert(!survivors.contains(h), s"false negative through store: $h"))
  }
}
