package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet tables (TESTDATA.md).
  * One parquet directory per table under the scale-factor dir.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table, which stores TIMESTAMP(NANOS) parquet — Spark's
    * vectorized reader rejects nanos, so it is read as raw int64 nanos
    * via the legacy conf. The conf mutation lives here, at the single
    * read boundary, not inside query bodies (one global side effect per
    * session instead of one per query call). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (spark.conf.getOption(NanosConf).forall(_ != "true"))
      spark.conf.set(NanosConf, "true")
    apply(spark, sfDir, "events")
  }

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
}
