package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the engine's scalar library for SQL callers (the Metabase
  * entry point, SURVEY §3.3): BI tools speak SQL text, so the column
  * functions are also exposed as SQL UDFs.
  *
  * These are Spark 4 SQL UDFs (`CREATE TEMPORARY FUNCTION … RETURN
  * expr`): the analyzer INLINES the body into the caller's plan, so they
  * optimize and codegen exactly like the Column versions — no JVM UDF
  * black box, predicate pushdown through them still works.
  */
object Registry {

  /** Install all temp functions into the session. Idempotent. */
  def install(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION parse_brl_money(v STRING)
        |RETURNS DECIMAL(15,2)
        |RETURN CAST(translate(translate(coalesce(v, '0'), '.', ''), ',', '.') AS DECIMAL(15,2))
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION blank_to_null(v STRING)
        |RETURNS STRING
        |RETURN CASE WHEN v RLIKE '^\\s*$' THEN NULL ELSE v END
        |""".stripMargin)
    // valor coalesces to '0', not 'None': the pipeline applies fillna('0')
    // to Valor BEFORE hashing (reference app/app.py:65, app/utils.py:6), so
    // SQL callers must produce the same id_hash for rows with missing Valor.
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION ledger_hash(
        |  tipo STRING, grupo STRING, categoria STRING,
        |  data STRING, descricao STRING, valor_raw STRING)
        |RETURNS STRING
        |RETURN md5(concat(
        |  lower(trim(coalesce(tipo, 'None'))), '-',
        |  lower(trim(coalesce(grupo, 'None'))), '-',
        |  lower(trim(coalesce(categoria, 'None'))), '-',
        |  trim(coalesce(data, 'None')), '-',
        |  lower(trim(coalesce(descricao, 'None'))), '-',
        |  coalesce(valor_raw, '0')))
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(t STRING)
        |RETURNS STRING
        |RETURN md5(regexp_replace(lower(trim(t)), '\\s+', ' '))
        |""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION ws_token_count(t STRING)
        |RETURNS INT
        |RETURN CASE WHEN t IS NULL OR trim(t) = '' THEN 0
        |            ELSE size(split(trim(t), '\\s+')) END
        |""".stripMargin)
  }
}
