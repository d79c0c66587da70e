package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** K3: the reference's `INSERT … ON CONFLICT (keys) DO NOTHING`
  * (app/etl.py:51,66,81,98,129 + UNIQUE constraints in
  * initdb/01_schema.sql:15,23,35,47,75). Spark has no constraints; the
  * equivalent composite operator is
  *   dropDuplicates(keys)  →  left-anti join against existing  →  append.
  *
  * Scale notes (100 TB): the anti-join shuffles on the merge keys. When
  * the existing key set is small (dimension tables) Catalyst broadcasts
  * it and nothing shuffles; at fact scale the existing table should be
  * bucketed/partitioned by the same keys so only the incoming delta
  * moves. Postgres enforced in-statement dedup via the unique index
  * (SURVEY §1.4-4); here dropDuplicates provides it explicitly.
  */
object MergeIgnore {

  /** Rows of `batch` whose key is not present in `existing`,
    * at most one row per key value.
    *
    * r19 (guide §2.4): no `distinct()` on the anti-join's existing
    * side — anti-join semantics are duplicate-insensitive (a key
    * matches whether the right side holds it once or N times), so the
    * distinct was a pure extra exchange + aggregate over the existing
    * key scan on every merge; at fact scale that is a full pass over
    * the (already unique by merge invariant) stored key column. */
  def newRows(batch: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val deduped = batch.dropDuplicates(keys)
    existing match {
      case null => deduped
      case ex =>
        deduped.join(ex.select(keys.map(col): _*), keys, "left_anti")
    }
  }
}
