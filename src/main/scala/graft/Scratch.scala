package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-18 profiling scratch — NOT part of the driver
  * contract; deleted before the round's snapshot commit. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def phase[T](name: String)(f: => T): T = {
      Bench.steadyState(spark)
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (_ <- 1 to 2) {
      // q133's edge build in isolation (self-join form)
      phase("q133 edge build (self-join)") {
        val op = t("lineitem")
          .filter(col("l_orderkey") % 3 === 0)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val e0 = op.as("x").join(op.as("y"),
            col("x.o") === col("y.o") && col("x.p") < col("y.p"))
          .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
        e0.write.format("noop").mode("overwrite").save()
      }
      // in-array pair generation form (q149/q131 shape)
      phase("q133 edge build (array pairs)") {
        val op = t("lineitem")
          .filter(col("l_orderkey") % 3 === 0)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        val e0 = op.groupBy(col("o"))
          .agg(sort_array(collect_set(col("p"))).as("ps"))
          .select(explode(call_function(
            graft.expressions.ArrayPairs.name, col("ps"))).as("pr"))
          .select(col("pr.ia").as("a"), col("pr.ib").as("b")).distinct()
        e0.write.format("noop").mode("overwrite").save()
      }
      // q133 full (current)
      phase("q133 full") {
        SparkEntry.queries("q133_bfs_hops")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      // q124 full (current)
      phase("q124 full") {
        SparkEntry.queries("q124_pagerank")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
