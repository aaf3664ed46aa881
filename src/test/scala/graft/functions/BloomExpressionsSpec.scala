package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom_might_contain agrees with the filter and has no false negatives") {
    val seen = (0L until 2000L).map(i => i * 2654435761L).toDF("h")
    val bf = seen.stat.bloomFilter("h", 2000L, 0.01)
    val bc = spark.sparkContext.broadcast(bf)

    val probe = (0L until 4000L).map(i => i * 2654435761L).toDF("h")
    val got = probe
      .select($"h", BloomFunctions.bloom_might_contain($"h", bc).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // exact agreement with driver-side probes
    got.foreach { case (h, hit) => assert(hit == bf.mightContainLong(h), s"h=$h") }
    // no false negatives on inserted keys
    (0L until 2000L).map(_ * 2654435761L).foreach(h => assert(got(h)))
    bc.destroy()
  }

  test("bloom probe filter stays inside WholeStageCodegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(xxhash64($"doc_id").as("h"))
    val bc = spark.sparkContext.broadcast(
      docs.limit(10).stat.bloomFilter("h", 10L, 0.01))
    val df = docs.filter(!BloomFunctions.bloom_might_contain($"h", bc))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan)
    assert(df.count() > 0)
    bc.destroy()
  }
}
