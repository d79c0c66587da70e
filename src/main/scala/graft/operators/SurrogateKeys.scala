package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SERIAL surrogate-key replacement (initdb/01_schema.sql:14,22,30,42,54,67).
  *
  * `row_number()` over an explicit total order, offset by the existing
  * max id — dense, stable across reruns, resumable. NEVER
  * `monotonically_increasing_id` (non-dense, partition-layout-dependent,
  * so not idempotent across cluster sizes).
  *
  * The un-partitioned window funnels through one task, which is correct
  * and cheap for dimension tables (at most ~millions of distinct values
  * even at 100 TB fact scale). For fact-scale id assignment use
  * [[assignScalable]], which trades the single-task bottleneck for a
  * two-pass zipWithIndex-style per-partition offset scheme.
  */
object SurrogateKeys {

  /** Dense ids 1..n (+offset) ordered by `orderBy`. Dimension-scale only. */
  def assign(df: DataFrame, idCol: String, orderBy: Seq[String], offset: Long = 0L): DataFrame = {
    val w = Window.orderBy(orderBy.map(col): _*)
    df.withColumn(idCol, (row_number().over(w) + lit(offset)).cast("int"))
  }

  /** Dense ids at fact scale: sort by `orderBy`, then per-partition
    * row_number + exclusive prefix-sum of partition sizes. Two passes,
    * no single-task window. */
  def assignScalable(df: DataFrame, idCol: String, orderBy: Seq[String], offset: Long = 0L): DataFrame = {
    val sorted = df.repartitionByRange(orderBy.map(col): _*)
      .sortWithinPartitions(orderBy.map(col): _*)
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    val counts = withPid.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val starts: Map[Int, Long] = pids.zip(
      pids.scanLeft(offset) { case (acc, p) => acc + counts(p) }).toMap
    val w = Window.partitionBy(col("__pid")).orderBy(orderBy.map(col): _*)
    val startExpr = starts.foldLeft(lit(offset)) { case (e, (p, s)) =>
      when(col("__pid") === p, lit(s)).otherwise(e)
    }
    withPid
      .withColumn(idCol, row_number().over(w).cast("long") + startExpr)
      .drop("__pid")
  }
}
