package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("prunedJoin equals the plain join exactly (inner and left_semi)") {
    val probe = Tables(spark, sf001, "lineitem")
    val build = Tables(spark, sf001, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") < 500)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = probe.join(build, Seq("l_orderkey"), "inner")
    val bloomed = BloomJoin.prunedJoin(probe, build, "l_orderkey",
      expectedItems = 10000, fpp = 0.01, joinType = "inner")
    assert(bloomed.count() === plain.count())
    assert(bloomed.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(bloomed).count() === 0)

    val semiPlain = probe.join(build, Seq("l_orderkey"), "left_semi")
    val semiBloom = BloomJoin.prunedJoin(probe, build, "l_orderkey",
      expectedItems = 10000, joinType = "left_semi")
    assert(semiBloom.exceptAll(semiPlain).count() === 0)
    assert(semiPlain.exceptAll(semiBloom).count() === 0)
  }

  test("the probe actually prunes: survivors are few, all matches kept") {
    val probe = Tables(spark, sf001, "lineitem")
    val build = Tables(spark, sf001, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"))
    val sketch = build.stat.bloomFilter("o_orderkey", 1000, 0.01)
    val kept = probe.filter(
      BloomJoin.mightContain(col("l_orderkey"), BloomJoin.serialize(sketch)))
    val total = probe.count()
    val keptN = kept.count()
    val trueN = probe.join(build.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    // every true match survives the probe (no false negatives)…
    assert(keptN >= trueN)
    // …and the pass-through is near the true rate, not the full table
    // (1% of keys match; allow generous fpp slack)
    assert(keptN <= trueN + (total * 0.05).toLong,
      s"bloom pruned too little: kept $keptN of $total, true $trueN")
  }

  test("string keys probe UTF-8 bytes; null keys yield null (filtered out)") {
    val build = Seq("apple", "banana").toDF("k")
    val sketch = build.stat.bloomFilter("k", 10, 0.01)
    val probe = Seq(Some("apple"), Some("cherry"), None).toDF("k")
    val kept = probe.filter(BloomJoin.mightContain(col("k"), BloomJoin.serialize(sketch)))
      .as[String].collect()
    assert(kept.toSeq === Seq("apple"))
  }

  test("bloom probe stays inside whole-stage codegen") {
    val probe = Tables(spark, sf001, "lineitem")
    val build = Tables(spark, sf001, "orders").select(col("o_orderkey")).limit(100)
    val sketch = build.stat.bloomFilter("o_orderkey", 100, 0.01)
    val plan = probe.filter(
        BloomJoin.mightContain(col("l_orderkey"), BloomJoin.serialize(sketch)))
      .queryExecution.executedPlan
    val codegenSpans = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    // the filter must sit inside a codegen span, not fall back
    assert(codegenSpans.exists(_.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.nonEmpty), plan.toString)
  }

  test("rejects unsupported join types and bad sizing") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(df, df, "k", 10, joinType = "left_outer")
    }
    intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(df, df, "k", 0)
    }
  }
}
