package graft.ledger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Entry point 3 (SURVEY §3.3): the ad-hoc SQL surface + canned
  * Metabase-shape queries over the registered star schema, and the
  * typed `Dataset[Lancamento]` view of the fact table (SURVEY §1.1).
  * Call `catalog.registerAll()` (or let `Warehouse.run()` do it) before
  * querying.
  */
object BiQueries {

  /** Typed fact row (physical partition columns ano/mes included). */
  final case class Lancamento(
      id_lancamento: Long, id_tipo: Int, id_grupo: Int, id_categoria: Int,
      id_tempo: Int, id_classificacao: Int, descricao: String,
      valor: java.math.BigDecimal, id_hash: String, ano: Int, mes: Int)

  def fact(catalog: Catalog): Dataset[Lancamento] = {
    val spark = catalog.spark
    import spark.implicits._
    catalog.table("fato_lancamento").as[Lancamento]
  }

  /** Monthly totals by tipo — the canonical Metabase slice
    * (SURVEY §7.2's end-to-end query). */
  def monthlyByTipo(spark: SparkSession): DataFrame = spark.sql(
    """SELECT t.nome_tipo, tm.ano, tm.mes, SUM(f.valor) AS total
      |FROM fato_lancamento f
      |JOIN dim_tipo t USING (id_tipo)
      |JOIN dim_tempo tm USING (id_tempo)
      |GROUP BY 1, 2, 3
      |ORDER BY 2, 3, 1""".stripMargin)

  /** Category drill-down: tipo → grupo → categoria totals. */
  def categoryDrilldown(spark: SparkSession): DataFrame = spark.sql(
    """SELECT t.nome_tipo, g.nome_grupo, c.nome_categoria,
      |       SUM(f.valor) AS total, COUNT(*) AS n
      |FROM fato_lancamento f
      |JOIN dim_tipo t USING (id_tipo)
      |JOIN dim_grupo g USING (id_grupo)
      |JOIN dim_categoria c USING (id_categoria)
      |GROUP BY ROLLUP (t.nome_tipo, g.nome_grupo, c.nome_categoria)""".stripMargin)

  /** Share of each classification within a month. */
  def classificationShare(spark: SparkSession, ano: Int, mes: Int): DataFrame = spark.sql(
    s"""SELECT cl.nome_classificacao,
       |       SUM(f.valor) AS total,
       |       SUM(f.valor) / SUM(SUM(f.valor)) OVER () AS share
       |FROM fato_lancamento f
       |JOIN dim_classificacao cl USING (id_classificacao)
       |WHERE f.ano = $ano AND f.mes = $mes
       |GROUP BY 1""".stripMargin)
}
