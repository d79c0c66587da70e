package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar interchange format a warehouse
  * migration meets in practice (Hive-era lakes are ORC). Spark's native
  * reader gives the same scan-level machinery as parquet: predicate
  * pushdown into stripe/row-group statistics, column pruning, and
  * vectorized decoding, so an ORC-resident table can be queried in
  * place at full speed or converted once for parquet-homed analytics.
  */
object Orc {

  /** Read with a DECLARED schema (inference costs a footer pass per
    * file and loosens the contract). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** One-pass conversion to parquet, the engine's home format. */
  def toParquet(spark: SparkSession, orcPath: String, schema: StructType,
                parquetPath: String, partitionBy: Seq[String] = Seq.empty): Unit = {
    val w = read(spark, orcPath, schema).write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(parquetPath)
  }
}
