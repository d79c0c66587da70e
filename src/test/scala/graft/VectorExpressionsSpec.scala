package graft

import org.apache.spark.sql.functions._
import graft.expressions.VectorExpressions.dotF

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dotF equals the composed aggregate/zip_with form bit-for-bit") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rng.nextFloat() * 2 - 1),
      Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val composed = aggregate(
      zip_with(col("a"), col("b"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (s, v) => s + v)
    val out = df.select(dotF(col("a"), col("b")).as("fast"), composed.as("slow"))
      .as[(Double, Double)].collect()
    out.foreach { case (f, s) => assert(f === s) } // identical accumulation order
  }

  test("dotF nulls and edge shapes") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
    val out = df.select(dotF(col("a"), col("b"))).as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(11.0), None, Some(0.0)))
  }

  test("dotF matches composed-form null semantics: length mismatch and null elements") {
    val df = Seq(
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(3.0f))),              // unequal length
      (Seq(Some(1.0f), None), Seq(Some(3.0f), Some(4.0f))),        // null element
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(3.0f), Some(4.0f)))) // clean
      .toDF("a", "b")
    val out = df.select(dotF(col("a"), col("b"))).as[Option[Double]].collect()
    assert(out.toSeq === Seq(None, None, Some(11.0)))
  }

  test("dotF stays inside whole-stage codegen") {
    val df = Tables(spark, sf0001, "embeddings").limit(10)
      .select(dotF(col("embedding"), col("embedding")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected WholeStageCodegen span:\n$plan")
    assert(df.as[Double].collect().forall(_ > 0))
  }
}
