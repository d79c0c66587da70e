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
}
