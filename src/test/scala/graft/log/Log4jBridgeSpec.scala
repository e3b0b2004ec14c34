package graft.log

import org.apache.logging.log4j.{Level, LogManager, MarkerManager, ThreadContext}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Log4j2 → LogSink bridge behavior, including the async-context hazard
  * the reference tests in AsyncContextSpec.scala: ThreadContext data must
  * be the EMITTING thread's values, not the async dispatcher thread's. */
class Log4jBridgeSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-l4j").toString

  // unique logger name per test: bridges attach to the shared Log4j
  // configuration, and a leftover logger config would cross-talk
  private var n = 0
  def loggerName(): String = { n += 1; s"graftbridge$n.t${System.nanoTime()}" }

  test("log4j events route into the parquet sink with level/logger/run_id") {
    val name = loggerName()
    val dir = tmp() + "/logs"
    val sink = new ParquetLogSink(spark, dir, flushThreshold = 100)
    val bridgeRunId = Log4jBridge.init(sink, name, Level.WARN)
    try {
      val log = LogManager.getLogger(s"$name.engine")
      log.warn("watermark {} behind", 3)
      log.error("merge failed")
      log.debug("invisible below threshold")
      // AUDIT-marked INFO passes even though threshold is WARN
      log.info(MarkerManager.getMarker("AUDIT"), "processing summary")
      Log4jBridge.flush(name)

      val rows = spark.read.schema(LogSchema.fields).parquet(dir)
        .collect().map(r => (r.getString(1), r.getString(2), r.getString(3),
          r.getString(4))).sortBy(_._3)
      rows.length shouldBe 3
      rows.map(_._1).sorted shouldBe Array("ERROR", "INFO", "WARN")
      rows.foreach(_._2 shouldBe s"$name.engine")
      rows.map(_._3) should contain("watermark 3 behind") // parameterized msg formatted
      rows.foreach(_._4 shouldBe bridgeRunId) // no ThreadContext → bridge default
    } finally Log4jBridge.shutdown(name)
  }

  test("concurrent threads keep their own ThreadContext run_id through the async path") {
    val name = loggerName()
    val dir = tmp() + "/logs"
    val sink = new ParquetLogSink(spark, dir, flushThreshold = 1000)
    Log4jBridge.init(sink, name, Level.INFO)
    try {
      val log = LogManager.getLogger(s"$name.worker")
      val threads = 8
      val perThread = 50
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(threads)
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            // per-entity context, the Runner.parallelism shape
            ThreadContext.put("run_id", s"run-$t")
            ThreadContext.put("entity_id", t.toString)
            start.await()
            (0 until perThread).foreach(i => log.info(s"evt $t $i"))
            ThreadContext.clearMap()
          }
        })
      }
      start.countDown() // all threads log at once → async queue contention
      pool.shutdown()
      pool.awaitTermination(60, TimeUnit.SECONDS) shouldBe true
      Log4jBridge.flush(name)

      val rows = spark.read.schema(LogSchema.fields).parquet(dir)
        .collect().map(r => (r.getString(3), r.getString(4), r.getInt(5)))
      rows.length shouldBe threads * perThread
      // every event carries the EMITTING thread's context: "evt T I" must
      // pair with run-T / entity T, never another thread's or the default
      rows.foreach { case (msg, runId, entityId) =>
        val t = msg.split(" ")(1).toInt
        runId shouldBe s"run-$t"
        entityId shouldBe t
      }
    } finally Log4jBridge.shutdown(name)
  }

  test("shutdown drains pending async events; init is idempotent per logger") {
    val name = loggerName()
    val dir = tmp() + "/logs"
    val sink = new ParquetLogSink(spark, dir, flushThreshold = 1000)
    val id1 = Log4jBridge.init(sink, name)
    val id2 = Log4jBridge.init(sink, name) // second init: same bridge
    id2 shouldBe id1
    Log4jBridge.runId(name) shouldBe Some(id1)
    val log = LogManager.getLogger(s"$name.x")
    log.info("last words")
    Log4jBridge.shutdown(name) // must drain the async queue + flush sink
    spark.read.schema(LogSchema.fields).parquet(dir).count() shouldBe 1
    Log4jBridge.runId(name) shouldBe None
    // post-shutdown events go nowhere (appender detached) and don't throw
    log.info("after shutdown")
    spark.read.schema(LogSchema.fields).parquet(dir).count() shouldBe 1
  }
}
