package graft.ledger

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.MergeIgnore

/** Parquet-backed warehouse catalog. One directory per table under
  * `root`; every table is also registered as a temp view so the full
  * `spark.sql` surface works over the warehouse (the Metabase entry
  * point, SURVEY §3.3).
  *
  * Merge semantics: the reference relied on Postgres UNIQUE constraints +
  * `ON CONFLICT DO NOTHING` (reference app/etl.py:51,66,81,98,129). Spark
  * has no constraints, so [[mergeIgnore]] composes
  * dropDuplicates → left-anti join → append. The delta is materialized to
  * a staging subdir before the append so the append job never reads the
  * directory it writes (single-writer discipline; non-atomicity vs PG
  * transactions is documented in SURVEY §7.4-1).
  *
  * Scale: dims stay tiny (≤ millions of rows at 100 TB fact scale) so
  * their anti-joins broadcast. The fact merge anti-joins on `id_hash`
  * — at scale the existing-side read prunes to the `ano/mes` partitions
  * present in the incoming batch (a monthly batch touches one partition,
  * not the whole history).
  */
final class Catalog(val spark: SparkSession, val root: String) {

  private def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean =
    Files.exists(Paths.get(path(table).stripPrefix("file:")))

  /** Read a table, or an empty frame with the declared schema. */
  def table(table: String): DataFrame =
    if (exists(table)) spark.read.schema(Schemas.schemaOf(table)).parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.schemaOf(table))

  def register(table: String): Unit =
    this.table(table).createOrReplaceTempView(table)

  def registerAll(): Unit = Schemas.tableNames.foreach(register)

  /** K1: full-replace write (staging semantics, reference app/app.py:79). */
  def replace(table: String, df: DataFrame): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path(table))
    register(table)
  }

  /** Current max of an integral column, or 0 on empty/missing table —
    * the surrogate-key offset (SERIAL resume semantics). */
  def maxId(table: String, idCol: String): Long =
    this.table(table).agg(coalesce(max(col(idCol).cast("long")), lit(0L)))
      .head().getLong(0)

  /** K3: insert-if-absent. Appends `batch` rows whose `keys` are not
    * already in `table`, deduped per key within the batch. Returns the
    * number of rows appended. `partitionBy` controls physical layout
    * (fact: ano/mes).
    */
  def mergeIgnore(table: String, batch: DataFrame, keys: Seq[String],
                  partitionBy: Seq[String] = Seq.empty): Long = {
    val existing = if (exists(table)) this.table(table) else null
    appendDelta(table, MergeIgnore.newRows(batch, existing, keys), partitionBy)
  }

  /** Append a pre-computed delta (already deduped/anti-joined). The
    * delta plan may read `table` itself, so it is materialized to a
    * staging subdir first — the append job must never scan files it is
    * concurrently creating. */
  def appendDelta(table: String, delta: DataFrame,
                  partitionBy: Seq[String] = Seq.empty): Long = {
    val tmp = s"$root/.delta_${table}_${java.util.UUID.randomUUID().toString.take(8)}"
    delta.write.mode(SaveMode.Overwrite).parquet(tmp)
    val materialized = spark.read.schema(delta.schema).parquet(tmp)
    val n = materialized.count()
    if (n > 0) {
      val w = materialized.write.mode(SaveMode.Append)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(path(table))
    }
    deleteRecursively(Paths.get(tmp))
    register(table)
    n
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
