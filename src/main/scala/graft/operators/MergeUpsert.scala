package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K3 extended to a full upsert: the reference's merge surface stops at
  * `INSERT … ON CONFLICT (keys) DO NOTHING` (app/etl.py:51,66,81,98,129
  * — [[MergeIgnore]]); the other half of Postgres' merge family is
  * `… DO UPDATE SET` (and SQL:2016 `MERGE WHEN MATCHED THEN UPDATE`),
  * which a warehouse needs the moment a dimension attribute can change
  * without opening an SCD-2 history row ([[Scd2]] covers the versioned
  * variant; this is the overwrite-in-place variant).
  *
  * Semantics: one surviving row per key from `batch` (the latest by
  * `orderBy`, descending — Postgres resolves multi-row conflicts by
  * statement order; a distributed batch has no order, so the caller
  * names the tie-break); matched `existing` rows are REPLACED by the
  * batch row, unmatched existing rows are kept, unmatched batch rows
  * are inserted.
  *
  * Shape: one window shuffle on the keys to pick the batch survivor,
  * one anti-join shuffle (or broadcast, when the batch key set is
  * small) to drop the overwritten rows — no full-outer join, and the
  * `existing` payload never moves through a window. At fact scale the
  * anti-join prunes to the key partitions present in the batch exactly
  * like the warehouse fact merge (Warehouse.existingFactForMerge).
  */
object MergeUpsert {

  /** The merged table: `existing` rows whose key is absent from
    * `batch`, plus one row per batch key (latest by `orderBy` desc;
    * arbitrary-but-single when `orderBy` is empty). `batch` may carry
    * extra columns (e.g. the ordering timestamp) — the result keeps
    * exactly `existing`'s columns. `existing = null` means no current
    * table: the deduped batch IS the result. */
  def upsert(existing: DataFrame, batch: DataFrame, keys: Seq[String],
             orderBy: Seq[Column] = Seq.empty): DataFrame = {
    val survivors =
      if (orderBy.isEmpty) batch.dropDuplicates(keys)
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
        batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    existing match {
      case null => survivors
      case ex =>
        val latest = survivors.select(ex.columns.map(col).toIndexedSeq: _*)
        // anti-join against the RAW batch's distinct keys, not the
        // windowed survivors: the key sets are identical, and this keeps
        // the window/sort subtree out of the broadcast build side (the
        // survivor exchange is still computed only once — AQE reuses it
        // for the union side)
        ex.join(batch.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .unionByName(latest)
    }
  }
}
