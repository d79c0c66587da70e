package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format of large text/
  * training-data corpora. Thin, schema-explicit wrappers over Spark's
  * native json reader (splittable per line, predicate/column pruning
  * apply after parse; at 100 TB keep jsonl for interchange and convert
  * to parquet for repeated analytics — [[toParquet]]).
  */
object Jsonl {

  /** Read with a DECLARED schema (never inference at scale: schema
    * inference is a full extra pass over the data). Corrupt lines are
    * preserved in `_corrupt_record` for a rejects audit. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** One-pass conversion to parquet, the columnar home format. */
  def toParquet(spark: SparkSession, jsonlPath: String, schema: StructType,
                parquetPath: String, partitionBy: Seq[String] = Seq.empty): Unit = {
    val clean = read(spark, jsonlPath, schema)
      .filter("_corrupt_record IS NULL").drop("_corrupt_record")
    val w = clean.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(parquetPath)
  }
}
