package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.LedgerFunctions._

/** Golden-value tests for the §2.6 scalar library. MD5 goldens were
  * precomputed with Python hashlib against the reference's exact key
  * construction (reference app/utils.py:16-25) for byte-parity.
  */
class LedgerFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("blankToNull: empty and whitespace-only become null") {
    val out = Seq("", "  ", "\t", " x ", "a")
      .toDF("c").select(blankToNull(col("c"))).as[Option[String]].collect()
    assert(out.toSeq === Seq(None, None, None, Some(" x "), Some("a")))
  }

  test("parseBrazilianMoney: locale parse to exact decimal") {
    val out = Seq("1.234,56", "10.000,00", "0,99", "7", null)
      .toDF("c").select(parseBrazilianMoney(col("c")).cast("string"))
      .as[String].collect()
    assert(out.toSeq === Seq("1234.56", "10000.00", "0.99", "7.00", "0.00"))
  }

  test("ledgerHash: byte-parity with reference gerar_hash (python md5 goldens)") {
    val df = Seq(
      ("Despesa", " Moradia ", "Aluguel", " 01/2024 ", "Pagamento Março", "1.234,56"),
      ("Receita", "Salário", "CLT", "12/2023", "AÇÃO é ótima", "10.000,00")
    ).toDF("tipo", "grupo", "categoria", "data", "descricao", "valor")
    val out = df.select(ledgerHash(col("tipo"), col("grupo"), col("categoria"),
      col("data"), trim(col("descricao")), col("valor"))).as[String].collect()
    assert(out.toSeq === Seq(
      "022e4d86e5ba6b760869697a93ceb7b3",
      "c88dbd0cfcdefde77f195aa812448f3f"))
  }

  test("ledgerHash: nulls render as python str(None)") {
    val df = Seq((Option.empty[String], Option.empty[String], Option.empty[String],
      Option.empty[String], Option.empty[String], Option.empty[String]))
      .toDF("t", "g", "c", "d", "de", "v")
    val out = df.select(ledgerHash(col("t"), col("g"), col("c"), col("d"),
      col("de"), col("v"))).as[String].collect()
    // key = "none-none-none-None-none-None"
    assert(out.head === "10bfa193be82d2ebfd2ec0003574c369")
  }

  test("month functions: parse, bounds, iso week") {
    val df = Seq("02/2024", "12/2023").toDF("data")
      .select(parseMonth(col("data")).as("d"))
      .select(
        col("d").cast("string"),
        monthEnd(col("d")).cast("string"),
        isoWeek(col("d")),
        yearOf(col("d")), monthOf(col("d")))
    val rows = df.collect()
    assert(rows(0) === Row("2024-02-01", "2024-02-29", 5, 2024, 2))
    // 2023-12-01 is a Friday → ISO week 48 (pandas isocalendar parity)
    assert(rows(1) === Row("2023-12-01", "2023-12-31", 48, 2023, 12))
  }
}
