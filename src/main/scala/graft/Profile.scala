package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Scratch profiler for hot queries (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10ish")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        if (m.memoryBytesSpilled > 0)
          println(f"SPILL stage=${sc.stageInfo.stageId} mem=${m.memoryBytesSpilled / 1e9}%.2f GB disk=${m.diskBytesSpilled / 1e9}%.2f GB")
      }
    })

    val t0 = System.nanoTime()
    SparkEntry.queries("q89_containment")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"PROF q89 full ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"memSpill=${memSpill.get / 1e9}%.2f GB diskSpill=${diskSpill.get / 1e9}%.2f GB " +
      f"shufWrite=${shufWrite.get / 1e9}%.2f GB")
    spark.stop()
  }
}
