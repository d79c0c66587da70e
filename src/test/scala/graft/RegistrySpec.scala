package graft

import graft.functions.Registry

class RegistrySpec extends SparkSpec {
  import spark.implicits._

  test("SQL UDFs match the Column library on golden values") {
    Registry.install(spark)
    val r = spark.sql(
      """SELECT parse_brl_money('1.234,56') AS money,
        |       blank_to_null('   ') AS blank,
        |       ledger_hash('Despesa', ' Moradia ', 'Aluguel', ' 01/2024 ',
        |                   'Pagamento Março', '1.234,56') AS h,
        |       doc_fingerprint('Hello   World') AS fp1,
        |       doc_fingerprint(' hello world ') AS fp2,
        |       ws_token_count('a  b c') AS n
        |""".stripMargin).head()
    assert(r.getDecimal(0).toPlainString === "1234.56")
    assert(r.isNullAt(1))
    assert(r.getString(2) === "022e4d86e5ba6b760869697a93ceb7b3")
    assert(r.getString(3) === r.getString(4))
    assert(r.getInt(5) === 3)
  }

  test("SQL UDFs inline: predicate through parse_brl_money still prunes/pushes") {
    Registry.install(spark)
    Seq(("1,00"), ("2,00")).toDF("valor").createOrReplaceTempView("vals")
    val out = spark.sql("SELECT parse_brl_money(valor) v FROM vals WHERE parse_brl_money(valor) > 1.5")
    assert(out.as[java.math.BigDecimal].collect().map(_.toPlainString).toSeq === Seq("2.00"))
    // the body is inlined — no ScalaUDF node in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }
}
