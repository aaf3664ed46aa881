package graft.functions

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd vector kernels must be BIT-identical to the interpreted
  * HOF formulations they replaced (IEEE addition is order-sensitive and the
  * DuckDB oracle hashes depend on the fold order), share their null
  * semantics, and stay inside WholeStageCodegen. */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dotHof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
  private val sqHof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, v) -> acc + v)"

  test("bit-identical to the HOF fold on random vectors") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1))) :+
      ((Seq.empty[Double], Seq.empty[Double])) // empty fold = 0.0
    val df = rows.toDF("a", "b")
      .withColumn("dn", VF.array_dot($"a", $"b"))
      .withColumn("dh", expr(dotHof))
      .withColumn("sn", VF.array_sqdist($"a", $"b"))
      .withColumn("sh", expr(sqHof))
    // bit-level equality: compare raw long bits, not ===-with-tolerance
    val bad = df.filter(
      expr("cast(dn as string) <> cast(dh as string) or " +
        "cast(sn as string) <> cast(sh as string)"))
    assert(bad.count() == 0)
    assert(df.filter($"a".isNotNull && size($"a") === 0 && $"dn" =!= 0.0).count() == 0)
  }

  test("null semantics match the HOF: length mismatch and null elements") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),          // length mismatch
      (Seq(1.0, 2.0), Seq(1.0, 2.0))
    ).toDF("a", "b")
      .union(Seq((null.asInstanceOf[Seq[Double]], Seq(1.0))).toDF("a", "b"))
      .withColumn("dn", VF.array_dot($"a", $"b"))
      .withColumn("dh", expr(dotHof))
    val got = df.select($"dn".isNull, $"dh".isNull).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(got.forall { case (n1, n2) => n1 == n2 })
    assert(got.count(_._1) == 2) // mismatch + null input are null, good row isn't
  }

  test("dot/sqdist projections stay inside WholeStageCodegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val df = emb.select(VF.array_dot($"e", $"e").as("d"),
      VF.array_sqdist($"e", $"e").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.filter($"d" > 0 && $"s" === 0.0).count() > 0)
  }

  test("SQL registration: array_dot/array_sqdist callable from spark.sql") {
    VF.registerAll(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1d, 2d), array(3d, 4d)) AS d, " +
        "array_sqdist(array(1d, 2d), array(3d, 4d)) AS s").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 8.0)
  }
}
