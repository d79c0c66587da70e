package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for hot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val batch = base.unionAll(base.filter(col("doc_id") % 29 === 0).select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zz qq extra mutated tail")).as("text")))

    time("scan")(batch.count())
    val sig = batch.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles")(sig.count())
    time("shingles+explode")(sig.select(col("id"), explode(col("sh")).as("s")).count())
    val minCols = (1 to 12).map(h => min(md5(concat(lit(s"$h:"), col("s")))).as(s"m$h"))
    val mins = sig.select(col("id"), explode(col("sh")).as("s"))
      .groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
    time("minhash-agg")(mins.count())
    val bandCols = (0 until 4).map { b =>
      md5(concat_ws("|", lit(b.toString) +: (1 to 12).slice(b * 3, (b + 1) * 3).map(h => col(s"m$h")): _*))
    }
    val exploded = mins.select(col("id"), explode(array(bandCols: _*)).as("bk"))
    time("bands")(exploded.count())
    val candidates = exploded.as("a").join(exploded.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    time("candidates")(candidates.count())
    time("full")(Dedup.nearDupPairs(batch, "doc_id", "text").count())
    spark.stop()
  }
}
