package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge: attribute history as
  * versioned rows instead of the reference's insert-if-absent overwrite
  * semantics (app/etl.py:51,66,81,98 keeps only the first version of a
  * dimension row forever; SCD-2 is the standard warehouse extension
  * when attribute changes must stay queryable "as of" a load).
  *
  * Row shape: natural key columns + attribute columns +
  * (`valid_from` INT, `valid_to` INT-or-null); a row is current iff
  * `valid_to IS NULL`. Each merge runs at a caller-supplied
  * monotonically increasing `version` (batch number).
  *
  * Semantics per natural key in `batch`:
  *   - new key → one open row (valid_from = version);
  *   - existing key, attributes equal → untouched;
  *   - existing key, attributes differ → the open row closes
  *     (valid_to = version) and a new open row appears.
  * Keys absent from the batch are untouched (dimension batches are
  * partial by nature; deletions are out of scope like the reference's).
  * A key repeated within one batch is reduced to a single deterministic
  * winner before merging: by `max` of `orderCol` when given (ties broken
  * by the attribute struct), else by `max` over the attribute struct —
  * lexicographic by attribute order, i.e. the FIRST attr column
  * dominates, which is arbitrary unless callers pass `orderCol` (an
  * ingest timestamp / sequence number).
  *
  * Scale shape: one shuffle on the natural key (current ⋈ batch);
  * history rows pass through untouched — with the fact table's
  * partition layout this is a per-key merge, not a table rewrite.
  * All comparisons are null-safe (`<=>`).
  */
object Scd2 {

  def merge(existing: DataFrame, batch: DataFrame, keys: Seq[String],
            attrs: Seq[String], version: Int,
            orderCol: Option[String] = None): DataFrame = {
    val cols = keys ++ attrs
    val history = existing.filter(col("valid_to").isNotNull)
    val current = existing.filter(col("valid_to").isNull)
      .withColumn("__in_cur", lit(true))

    // one row per natural key: deterministic winner on key conflicts
    // (orderCol leads the max-struct when supplied; see class doc);
    // without this a repeated key would multiply the current row
    // through the join and open several simultaneous versions.
    // Struct fields get positional aliases: an orderCol that is ALSO a
    // tracked attribute (ingest timestamps usually are) would otherwise
    // produce duplicate field names and an ambiguous getField.
    val winnerOrder = orderCol.map(c => col(c).as("__ord")).toSeq ++
      attrs.zipWithIndex.map { case (a, i) => col(a).as(s"__a$i") }
    val bUnique = batch
      .groupBy(keys.map(col): _*)
      .agg(max(struct(winnerOrder: _*)).as("__s"))
      .select(keys.map(col) ++ attrs.zipWithIndex.map { case (a, i) =>
        col("__s").getField(s"__a$i").as(a)
      }: _*)
    val b = bUnique.select(cols.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__in_b", lit(true))
    val joined = current.join(b,
      keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _), "full_outer")

    // presence via non-nullable markers, NOT key-column nullness —
    // a NULL natural-key value is a legal key under the null-safe join
    val inBatch = col("__in_b").isNotNull
    val inCurrent = col("__in_cur").isNotNull
    val changed = attrs.map(a => !(col(a) <=> col(s"__b_$a"))).reduce(_ || _)

    // open rows that survive: untouched keys, and unchanged matches
    val kept = joined.filter(inCurrent && (!inBatch || !changed))
      .select(existing.columns.map(col): _*)
    // open rows that close at this version
    val closedNow = joined.filter(inCurrent && inBatch && changed)
      .select(existing.columns.map(col): _*)
      .withColumn("valid_to", lit(version))
    // rows opening at this version: new keys + changed keys
    val opened = joined.filter(inBatch && (!inCurrent || changed))
      .select(cols.map(c => col(s"__b_$c").as(c)): _*)
      .withColumn("valid_from", lit(version))
      .withColumn("valid_to", lit(null).cast("int"))
      .select(existing.columns.map(col): _*)

    history.unionByName(kept).unionByName(closedNow).unionByName(opened)
  }

  /** The table as of `version`: rows whose validity interval covers it. */
  def asOf(table: DataFrame, version: Int): DataFrame =
    table.filter(col("valid_from") <= version &&
      (col("valid_to").isNull || col("valid_to") > version))
}
