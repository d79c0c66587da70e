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

  /** The events table, with `ts` normalized to a `tus` column: epoch
    * micros as BIGINT. Driver testdata has shipped two physical types
    * for `ts` — TIMESTAMP(NANOS) (which Spark reads as raw int64 nanos
    * under the legacy conf) and TIMESTAMP(MICROS) NTZ — so the single
    * read boundary here absorbs both instead of every query body
    * guessing. NTZ wall-clock is diffed against the NTZ epoch literal
    * (pure calendar arithmetic, session-timezone independent — a cast
    * to TimestampType would silently shift by the session zone). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (spark.conf.getOption(NanosConf).forall(_ != "true"))
      spark.conf.set(NanosConf, "true")
    val df = apply(spark, sfDir, "events")
    val tus = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // int64 nanos → micros; integer division (double loses >2^53 ns)
        org.apache.spark.sql.functions.expr("ts div 1000")
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        org.apache.spark.sql.functions.expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case _ =>
        org.apache.spark.sql.functions.expr("unix_micros(ts)")
    }
    df.withColumn("tus", tus)
  }

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"
}
