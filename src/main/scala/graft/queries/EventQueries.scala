package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** Event-stream analytics over the `events` table: gap-based
  * sessionization, JSON property extraction, and the as-of join.
  * All time arithmetic runs on epoch-microsecond BIGINTs (the parquet
  * stores TIMESTAMP(NANOS); both engines reduce to the same integers),
  * so every derived value is integer-exact across engines.
  */
object EventQueries {

  private val SessionGapUs: Long = 2L * 3600 * 1000000 // 2 hours

  /** events with ts as epoch micros (nanos parquet → long, legacy conf
    * set by the caller-facing query fns). */
  private def ev(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables(s, d, "events")
      .withColumn("tus", expr("ts div 1000"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // gap-based sessionization via lag + running sum (batch twin of the
    // streaming session_window).
    "q33_sessions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("new_sess",
          when(lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > SessionGapUs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(cum).cast("int"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tus")).as("session_start_us"),
          max(col("tus")).as("session_end_us"))
    }),

    // JSON property extraction + rollup by event type.
    "q34_json_extract" -> ((s, d) =>
      ev(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("bigint").as("sum_k"),
          max(col("k")).as("max_k"))),

    // as-of join: for every event, the user's latest purchase at or
    // before that moment (null if none yet).
    "q35_asof_join" -> ((s, d) => {
      val e = ev(s, d).select(col("event_id"), col("user_id"), col("tus"))
      val purchases = ev(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("tus").as("ptus"))
        .agg(max(col("value")).as("purchase_value"))
      AsOfJoin.lastAtOrBefore(e, purchases, Seq("user_id"),
        leftTime = "tus", rightTime = "ptus",
        payload = Seq("ptus", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          col("ptus").as("last_purchase_us"), col("purchase_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q33_sessions" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tus FROM events),
         |m AS (SELECT user_id, event_id, tus,
         |        CASE WHEN lag(tus) OVER w IS NULL
         |               OR tus - lag(tus) OVER w > $SessionGapUs THEN 1 ELSE 0 END AS ns
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (SELECT user_id, tus,
         |        CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                           ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
         |      FROM m)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |       MIN(tus) AS session_start_us, MAX(tus) AS session_end_us
         |FROM s GROUP BY 1, 2""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        | MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,

    "q35_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tus FROM events),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS ptus, MAX(value) AS purchase_value
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, p.ptus AS last_purchase_us, p.purchase_value
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.tus >= p.ptus""".stripMargin
  )
}
