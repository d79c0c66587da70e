package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for hot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val baskets = t("lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .join(t("part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))

    for (r <- 1 to 2) {
      Bench.steadyState(spark)
      time(s"run$r join only")(noop(baskets))
      Bench.steadyState(spark)
      val bkts = baskets.toDF("bk", "it")
        .groupBy(col("bk")).agg(sort_array(collect_set(col("it"))).as("items"))
      time(s"run$r basket agg")(noop(bkts))
      Bench.steadyState(spark)
      val b2 = bkts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"run$r basket agg+cache")(noop(b2))
      val itemN = b2.select(explode(col("items")).as("it"))
        .groupBy(col("it")).agg(count(lit(1)).as("n"))
      time(s"run$r itemN from cache")(noop(itemN))
      val pairN = b2
        .filter(size(col("items")) >= 2)
        .select(explode(flatten(transform(
          sequence(lit(0), size(col("items")) - 2),
          i => transform(
            slice(col("items"), i + 2, size(col("items"))),
            y => struct(element_at(col("items"), i + 1).as("ia"), y.as("ib")))))).as("pr"))
        .groupBy(col("pr.ia").as("ia"), col("pr.ib").as("ib"))
        .agg(count(lit(1)).as("pair_n"))
        .filter(col("pair_n") >= 20)
      time(s"run$r pairN from cache")(noop(pairN))
      Bench.steadyState(spark)
      time(s"run$r full mine")(noop(
        graft.operators.AssocRules.mine(baskets, minSupport = 20)))
    }
    spark.stop()
  }
}
