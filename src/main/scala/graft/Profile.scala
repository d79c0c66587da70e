package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SkewJoin}

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

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q32 components
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_extendedprice")
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    time("q32 scan li")(sink(li))
    time("q32 plain join")(sink(li.join(o, Seq("l_orderkey"))))
    time("q32 salted join")(sink(SkewJoin.saltedJoin(li, o, Seq("l_orderkey"), 8)))
    time("q32 full")(sink(SparkEntry.queries("q32_salted_join")(spark, sfDir)))

    // ---- q2 components
    time("q2 full")(sink(SparkEntry.queries("q2_star_revenue")(spark, sfDir)))
    locally {
      import org.apache.spark.sql.types.DecimalType
      val li2 = Tables(spark, sfDir, "lineitem")
      val o2 = Tables(spark, sfDir, "orders")
      val c2 = Tables(spark, sfDir, "customer")
      val n2 = broadcast(Tables(spark, sfDir, "nation"))
      val r2 = broadcast(Tables(spark, sfDir, "region"))
      def joined = li2.join(o2, col("l_orderkey") === col("o_orderkey"))
        .join(c2, col("o_custkey") === col("c_custkey"))
        .join(n2, col("c_nationkey") === col("n_nationkey"))
        .join(r2, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
      time("q2 joins+count only")(sink(joined.agg(count(lit(1)).as("n"))))
      time("q2 double sum")(sink(joined.agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))))
      time("q2 narrow decimal")(sink(joined.agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 2)) *
          (lit(1).cast(DecimalType(3, 2)) - col("l_discount").cast(DecimalType(3, 2))))
          .cast("double").as("rev"))))
    }

    // ---- q39
    time("q39 full")(sink(SparkEntry.queries("q39_window_suite")(spark, sfDir)))

    // ---- q20 components
    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val batch = base.unionAll(base.filter(col("doc_id") % 29 === 0).select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz qq extra mutated tail")).as("text")))
    val sig = batch.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("q20 shingles")(sink(sig))
    val minsNative = sig.filter(size(col("sh")) > 0).select(col("id"),
      graft.expressions.TextExpressions.minhashSigs(col("sh"), 12).as("ms"))
    time("q20 minhash-native")(sink(minsNative))
    time("q20 full")(sink(SparkEntry.queries("q20_minhash_lsh")(spark, sfDir)))
    time("q20 full again")(sink(SparkEntry.queries("q20_minhash_lsh")(spark, sfDir)))
    spark.stop()
  }
}
