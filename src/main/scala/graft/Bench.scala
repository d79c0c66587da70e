package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up scheduler + codegen paths so the first timed query doesn't
    // absorb session startup (~3-4 s). Touches no benchmark data.
    spark.range(100000).selectExpr("sum(id)").collect()
    // noop sink, not count(): count() lets the optimizer prune the
    // aggregate/projection expressions away, timing a cheaper plan
    // than the query actually is. noop materializes every column.
    // Two timed runs per query, min reported: single-shot times in a
    // shared JVM swing ±50% with JIT/GC phase (measured on identical
    // code); the min is the reproducible steady-state figure.
    // a failing query reports -1, never its fast-fail elapsed time
    // optional args: bench only these queries (local iteration aid; the
    // driver passes no args → full run)
    val only = args.toSet
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total over successes only: summing the -1 sentinels would make
    // failing rounds look FASTER than passing ones
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
