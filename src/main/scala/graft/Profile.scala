package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scratch profiler for hot queries (not part of the driver contract).
  *
  * Round 12: dissects q68_warehouse_e2e (11 s at sf0.1, ~10% of the
  * bench sweep, ~100 jobs) into its phases — staging ingest, each dim
  * loader, the fact merge, the rerun, the final read — with wall time
  * AND Spark job counts per phase, so the "is it commit overhead or
  * join work?" question has numbers. Loaders run SEQUENTIALLY here
  * (run() overlaps dim_tempo/dim_classificacao with the rest), so the
  * phase sum exceeds q68's in-bench wall time; the split, not the
  * total, is the signal.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })

    def phase[T](name: String)(f: => T): T = {
      val j0 = jobCount.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROF $name%-28s $dt%8.2f s  ${jobCount.get() - j0}%4d jobs")
      r
    }
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

    for (rep <- 1 to 2) {
      println(s"=== rep $rep (sequential loaders; in-bench run overlaps tempo/cls) ===")
      Bench.steadyState(spark)
      val src = t("orders").filter(col("o_orderkey") % 17 === 0 &&
        col("o_orderdate") < lit("1998-01-01").cast("date"))
      val csvish = src.select(
        concat(lit("pedido "), col("o_orderkey")).as("Descrição"),
        col("o_orderpriority").as("Tipo"),
        col("o_orderstatus").as("Grupo"),
        concat(lit("c"), col("o_custkey") % 10).as("Categoria"),
        concat(lit("cl"), col("o_orderkey") % 4).as("Classificação"),
        date_format(col("o_orderdate"), "MM/yyyy").as("Data"),
        translate(col("o_totalprice").cast(DecimalType(15, 2)).cast("string"),
          ".", ",").as("Valor"))
      val root = java.nio.file.Files.createTempDirectory("graft_prof68")
      graft.queries.CoreQueries.cleanupAtExit(root)
      val cat = new graft.ledger.Catalog(spark, s"$root/wh")
      phase("staging ingest+replace") {
        cat.replace("staging_lancamentos", graft.ledger.Ingest.toStaging(csvish))
      }
      val wh = new graft.ledger.Warehouse(cat)
      val total0 = System.nanoTime()
      cat.transaction {
        phase("  run1 dim_tempo")(wh.loadDimTempo())
        phase("  run1 dim_tipo")(wh.loadDimTipo())
        phase("  run1 dim_grupo")(wh.loadDimGrupo())
        phase("  run1 dim_categoria")(wh.loadDimCategoria())
        phase("  run1 dim_classificacao")(wh.loadDimClassificacao())
        phase("  run1 fato")(wh.loadFato())
        phase("  run1 registerAll")(cat.registerAll())
      }
      println(f"PROF run1 total (seq)         ${(System.nanoTime() - total0) / 1e9}%8.2f s")
      cat.transaction {
        phase("  run2 dim_tempo")(wh.loadDimTempo())
        phase("  run2 dim_tipo")(wh.loadDimTipo())
        phase("  run2 dim_grupo")(wh.loadDimGrupo())
        phase("  run2 dim_categoria")(wh.loadDimCategoria())
        phase("  run2 dim_classificacao")(wh.loadDimClassificacao())
        phase("  run2 fato")(wh.loadFato())
        phase("  run2 registerAll")(cat.registerAll())
      }
      phase("final fact read") {
        cat.table("fato_lancamento")
          .withColumn("valor", col("valor").cast("double"))
          .write.format("noop").mode("overwrite").save()
      }
      phase("bench-shape q68 (fresh cat)") {
        SparkEntry.queries("q68_warehouse_e2e")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
