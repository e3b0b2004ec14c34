package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Ad-hoc job/stage profiler for a single SparkEntry query (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("GRAFT_FILE_IMPL",
          "org.apache.hadoop.fs.RawLocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var base = System.nanoTime()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        starts.put(j.jobId, System.nanoTime())
        val p = Option(j.properties)
        val site = p.flatMap(x => Option(x.getProperty("callSite.short"))).getOrElse("")
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description"))).getOrElse("")
        val at = (System.nanoTime() - base) / 1e6
        println(f"[job ${j.jobId}] t=$at%.0fms stages=${j.stageInfos.size} $site | ${desc.take(80)}")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.get(j.jobId)).foreach { t0 =>
          println(f"[job ${j.jobId}] done in ${(System.nanoTime() - t0) / 1e6}%.0f ms")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    }
    // warm first (staging + codegen), then measure the second execution
    SparkEntry.queries(name)(spark, sfDir).collect()
    spark.catalog.clearCache()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    base = t0
    val n = SparkEntry.queries(name)(spark, sfDir).collect().length
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    println(f"[profile] $name rows=$n jobs=$jobs stages=$stages tasks=$tasks time=$sec%.2fs")
    spark.stop()
  }
}
