package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Oracle-checked plumbing for the multimodal table: binary payload
  * construction, typed metadata, byte-level stats. (Feature extraction
  * itself runs through the stub codec in mapPartitions — JVM-side, not
  * SQL-expressible — and is covered by MultimodalSpec instead.)
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // binary column + typed metadata: per-row byte stats and digest.
    "q25_media_meta" -> ((s, d) =>
      Multimodal.syntheticMedia(Tables(s, d, "documents"))
        .select(
          col("media_id"), col("kind"),
          length(col("payload")).cast("bigint").as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("width"), col("height"))),

    // per-kind rollup: the "scan the media lake" shape.
    "q26_media_by_kind" -> ((s, d) =>
      Multimodal.syntheticMedia(Tables(s, d, "documents"))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("payload"))).cast("bigint").as("total_bytes"),
          max(col("width")).as("max_width")))
  )

  def oracleSql: Map[String, String] = Map(

    "q25_media_meta" ->
      """SELECT doc_id AS media_id,
        | list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 AS INT) + 1) AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS payload_md5,
        | CAST(doc_id % 64 + 16 AS INT) AS width,
        | CAST(doc_id % 48 + 16 AS INT) AS height
        |FROM documents""".stripMargin,

    "q26_media_by_kind" ->
      """SELECT list_extract(['image', 'audio', 'video'], CAST(doc_id % 3 AS INT) + 1) AS kind,
        | COUNT(*) AS n_media,
        | CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | CAST(MAX(doc_id % 64 + 16) AS INT) AS max_width
        |FROM documents
        |GROUP BY 1""".stripMargin
  )
}
