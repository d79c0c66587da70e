package graft.ledger

import org.apache.spark.sql.types._

/** Explicit schemas for the ledger pipeline (SURVEY §1.2/§1.3).
  * Schema-on-read replaces the reference's pandas inference
  * (reference app/app.py:22,25): the CSV contract is declared, not
  * guessed, so bad files fail loudly at the scan.
  */
object Schemas {

  /** The 7 required CSV columns (reference app/app.py:25). All read as
    * string; typing happens in explicit normalize steps so the raw
    * values stay available for the dedup hash (SURVEY §1.4-1).
    */
  val requiredColumns: Seq[String] = Seq(
    "Descrição", "Tipo", "Grupo", "Categoria", "Classificação", "Data", "Valor")

  val csvSchema: StructType = StructType(
    requiredColumns.map(StructField(_, StringType, nullable = true)))

  /** Staging = the CSV columns + the raw-value dedup hash, with Valor
    * coerced to exact money (reference app/app.py:66,79). */
  val stagingSchema: StructType = StructType(
    Seq(
      StructField("Descrição", StringType),
      StructField("Tipo", StringType),
      StructField("Grupo", StringType),
      StructField("Categoria", StringType),
      StructField("Classificação", StringType),
      StructField("Data", StringType),
      StructField("Valor", DecimalType(15, 2)),
      StructField("id_hash", StringType, nullable = false)))

  // Warehouse star schema (reference initdb/01_schema.sql:13-86).
  val dimTipo: StructType = StructType(Seq(
    StructField("id_tipo", IntegerType, nullable = false),
    StructField("nome_tipo", StringType, nullable = false)))

  val dimClassificacao: StructType = StructType(Seq(
    StructField("id_classificacao", IntegerType, nullable = false),
    StructField("nome_classificacao", StringType, nullable = false)))

  val dimGrupo: StructType = StructType(Seq(
    StructField("id_grupo", IntegerType, nullable = false),
    StructField("id_tipo", IntegerType, nullable = false),
    StructField("nome_grupo", StringType)))

  val dimCategoria: StructType = StructType(Seq(
    StructField("id_categoria", IntegerType, nullable = false),
    StructField("id_grupo", IntegerType, nullable = false),
    StructField("nome_categoria", StringType)))

  val dimTempo: StructType = StructType(Seq(
    StructField("id_tempo", IntegerType, nullable = false),
    StructField("ano", IntegerType),
    StructField("mes", IntegerType),
    StructField("semana", IntegerType),
    StructField("data_inicio", DateType),
    StructField("data_fim", DateType)))

  /** Fact table. `ano`/`mes` are OUR physical partition columns (not in
    * the reference DDL): the fact parquet is laid out
    * `ano=YYYY/mes=M/part-*.parquet` so month-sliced BI queries prune
    * partitions instead of scanning 100 TB (SURVEY §4).
    */
  val fatoLancamento: StructType = StructType(Seq(
    StructField("id_lancamento", LongType, nullable = false),
    StructField("id_tipo", IntegerType, nullable = false),
    StructField("id_grupo", IntegerType, nullable = false),
    StructField("id_categoria", IntegerType, nullable = false),
    StructField("id_tempo", IntegerType, nullable = false),
    StructField("id_classificacao", IntegerType, nullable = false),
    StructField("descricao", StringType),
    StructField("valor", DecimalType(15, 2), nullable = false),
    StructField("id_hash", StringType, nullable = false),
    StructField("ano", IntegerType),
    StructField("mes", IntegerType)))

  /** Permissive-mode rejects (SURVEY §1.4-7): the raw row + the list of
    * violated columns. Replaced per batch, like staging. */
  val rejects: StructType = StructType(
    requiredColumns.map(StructField(_, StringType)) :+
      StructField("motivo", StringType, nullable = false))

  val tableNames: Seq[String] = Seq(
    "staging_lancamentos", "rejects_lancamentos", "dim_tempo", "dim_tipo",
    "dim_grupo", "dim_categoria", "dim_classificacao", "fato_lancamento")

  def schemaOf(table: String): StructType = table match {
    case "staging_lancamentos" => stagingSchema
    case "rejects_lancamentos" => rejects
    case "dim_tempo"           => dimTempo
    case "dim_tipo"            => dimTipo
    case "dim_grupo"           => dimGrupo
    case "dim_categoria"       => dimCategoria
    case "dim_classificacao"   => dimClassificacao
    case "fato_lancamento"     => fatoLancamento
  }

  /** Declared schema, or None for tables outside the star contract
    * (e.g. [[Catalog.maintainAgg]] rollups, which carry their own
    * schema in their parquet commits). */
  def schemaOfOpt(table: String): Option[StructType] =
    if (tableNames.contains(table)) Some(schemaOf(table)) else None
}
