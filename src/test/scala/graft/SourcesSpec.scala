package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType, LongType}

import graft.sources.Jsonl

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("jsonl: declared-schema read preserves corrupt lines for audit") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      """{"doc_id": 1, "text": "hello"}
        |not json at all
        |{"doc_id": 2, "text": "world"}""".stripMargin)
    // Spark disallows querying ONLY the corrupt column from raw json;
    // cache the parsed batch first (what a rejects-audit job does anyway)
    val df = Jsonl.read(spark, s"$dir/d.jsonl", docSchema).cache()
    try {
      assert(df.filter("_corrupt_record IS NULL").count() === 2)
      assert(df.filter("_corrupt_record IS NOT NULL").count() === 1)
    } finally df.unpersist()
  }

  test("jsonl → parquet conversion drops rejects and round-trips values") {
    val dir = Files.createTempDirectory("jsonl2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.jsonl"),
      """{"doc_id": 1, "text": "a"}
        |garbage
        |{"doc_id": 2, "text": "b"}""".stripMargin)
    Jsonl.toParquet(spark, s"$dir/d.jsonl", docSchema, s"$dir/p")
    val back = spark.read.parquet(s"$dir/p")
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(back.toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("bucketed tables co-locate joins: no shuffle exchange in the plan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val o = Tables(s2, sf0001, "orders").select("o_orderkey", "o_custkey")
    val li = Tables(s2, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    li.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_lineitem")
    val joined = s2.table("b_orders").join(s2.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }
}
