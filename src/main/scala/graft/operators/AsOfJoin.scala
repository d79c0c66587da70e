package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` within the same key (the
  * "latest state known at event time" join; time-series standard).
  *
  * Spark has no built-in as-of join. A naive range join
  * (`l.key = r.key AND r.t <= l.t` + max-per-row) explodes to
  * O(|L|·|R|/keys) intermediate rows. This implementation is the
  * union+window formulation: tag both sides, union, sort per key by
  * (time, side) with right-side rows first on ties, and carry the last
  * right row forward with `last(..., ignoreNulls) ROWS UNBOUNDED
  * PRECEDING`. Cost: ONE shuffle on the key + a per-key sort
  * — linear in |L|+|R|, the scalable shape at 100 TB.
  *
  * The payload travels as ONE struct column, not per-column carries: a
  * right row whose individual payload field is null must still win as a
  * whole (nulls included), exactly like DuckDB/pandas ASOF JOIN attach
  * the entire matched row. Per-column `last(ignoreNulls)` would blend
  * fields from different right rows when some fields are null.
  *
  * Contract: right should be unique per (key, rightTime) — pre-aggregate
  * duplicates, otherwise "which right row wins a tie" is undefined.
  * Unmatched left rows keep null payloads (left-join semantics,
  * matching DuckDB/pandas ASOF LEFT JOIN).
  */
object AsOfJoin {

  def lastAtOrBefore(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String,
                     payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select((keys ++ Seq("__t", "__side", "__p")).map(col): _*)

    // Left rows get a null __p via allowMissingColumns, so
    // last(ignoreNulls) skips them and lands on a whole right row.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val out = carried.filter(col("__side") === 1).drop("__t", "__side")
    payload.foldLeft(out) { (df, p) =>
      val name = if (left.columns.contains(p)) s"right_$p" else p
      df.withColumn(name, col("__p").getField(p))
    }.drop("__p")
  }

  /** Nearest-event join: for each left row, the right row whose time is
    * CLOSEST in either direction (ties break backward — the
    * at-or-before row wins, which also makes an exactly-equal-time
    * match unambiguous since both directions name the same row).
    *
    * Same shape as [[lastAtOrBefore]] — one union, ONE shuffle on the
    * keys, and the backward/forward carries are two frames over the
    * SAME sort order, so Catalyst reuses the exchange and sort rather
    * than re-partitioning per direction. `rightTime` must be in
    * `payload` (the arbitration reads it back for the distance). */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    require(payload.contains(rightTime),
      s"nearest: payload must carry rightTime ($rightTime) for arbitration")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select((keys ++ Seq("__t", "__side", "__p")).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left at equal __t, so the backward frame
    // sees equal-time matches (distance 0) and the forward frame only
    // strictly-later ones — no double arbitration at distance 0
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__pb", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__pf", first(col("__p"), ignoreNulls = true).over(wf))
    val db = col("__t") - col("__pb").getField(rightTime)
    val df_ = col("__pf").getField(rightTime) - col("__t")
    val picked = carried
      .filter(col("__side") === 1)
      .withColumn("__p",
        when(col("__pb").isNull, col("__pf"))
          .when(col("__pf").isNull, col("__pb"))
          .when(df_ < db, col("__pf"))
          .otherwise(col("__pb")))
      .drop("__t", "__side", "__pb", "__pf")
    payload.foldLeft(picked) { (df, p) =>
      val name = if (left.columns.contains(p)) s"right_$p" else p
      df.withColumn(name, col("__p").getField(p))
    }.drop("__p")
  }
}
