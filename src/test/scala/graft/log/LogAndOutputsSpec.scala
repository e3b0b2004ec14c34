package graft.log

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.metadata.Metadata
import graft.outputs.DataFactory
import graft.pipeline.ProcessingSummary

class LogAndOutputsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-log").toString

  // catalog-table names must be unique per JVM run: the in-memory catalog
  // dies with the session but managed-table LOCATIONS persist in the
  // warehouse dir, and a name reuse trips LOCATION_ALREADY_EXISTS
  val runTag: String = java.lang.Long.toHexString(System.nanoTime())

  test("parquet log sink: threshold flush + explicit flush + summary payload") {
    val sink = new ParquetLogSink(spark, tmp() + "/logs", flushThreshold = 3)
    val logger = new RunLogger(sink)
    logger.info("graft.test", "one")
    logger.info("graft.test", "two")
    sink.pending shouldBe 2 // below threshold: nothing written yet
    logger.info("graft.test", "three") // hits threshold → flush
    sink.pending shouldBe 0
    logger.summary(ProcessingSummary(7, "merge", recordsInSlice = 10,
      inserted = 3, updated = 2, unchanged = 5, durationMs = 123))
    logger.close() // explicit flush of the remainder

    val rows = sink.read()
    rows.count() shouldBe 4
    rows.select("run_id").distinct().count() shouldBe 1
    val summary = rows.filter(col("message") === "processing summary").head()
    summary.getAs[Int]("entity_id") shouldBe 7
    summary.getAs[String]("payload_json") should include(""""inserted":3""")
  }

  test("variant log sink: JSON payload stored as VARIANT, queryable") {
    val path = tmp() + "/vlogs"
    val sink = new VariantLogSink(spark, path)
    import spark.implicits._
    sink.append(Seq(
      ("run1", """{"inserted": 3, "strategy": "merge"}"""),
      ("run1", """{"inserted": 9, "strategy": "full"}"""))
      .toDF("run_id", "payload_json"))
    val back = sink.read()
      .select(expr("variant_get(payload, '$.inserted', 'int')").as("ins"))
      .collect().map(_.getInt(0)).sorted
    back shouldBe Array(3, 9)
  }

  test("table log sink: creates catalog table, VARIANT payload, insertInto reorder") {
    // db-qualified name: the database is created on demand
    // (reference: TableAppender.ensureTableExists)
    val sink =
      new TableLogSink(spark, s"graft_logdb_$runTag.run_logs", flushThreshold = 2)
    val logger = new RunLogger(sink)
    logger.info("graft.test", "one")
    sink.pending shouldBe 1
    logger.summary(ProcessingSummary(5, "merge", recordsInSlice = 4,
      inserted = 4)) // hits threshold → table created + flushed
    sink.pending shouldBe 0
    logger.close()

    val rows = spark.table(s"graft_logdb_$runTag.run_logs")
    rows.count() shouldBe 2
    // payload is a real VARIANT: typed field access works
    rows.filter(col("message") === "processing summary")
      .select(expr("variant_get(payload, '$.inserted', 'int')"))
      .head.getInt(0) shouldBe 4
    rows.select("run_id").distinct().count() shouldBe 1
  }

  test("table log sink: column reorder protects a pre-existing table layout") {
    // insertInto binds by POSITION — a table created earlier with another
    // column arrangement must still receive values in the right columns
    val t = s"graft_logs_reordered_$runTag"
    spark.sql(s"""CREATE TABLE $t (
      run_id STRING, message STRING, `timestamp` TIMESTAMP_NTZ, level STRING,
      logger STRING, payload VARIANT, entity_id INT) USING PARQUET""")
    val sink = new TableLogSink(spark, t, flushThreshold = 1)
    new RunLogger(sink, runId = "fixed-run").error("graft.test", "boom", entityId = 42)
    val row = spark.table(t).head()
    row.getAs[String]("level") shouldBe "ERROR"
    row.getAs[String]("message") shouldBe "boom"
    row.getAs[String]("run_id") shouldBe "fixed-run"
    row.getAs[Int]("entity_id") shouldBe 42
  }

  test("metadata selects the table sink via log_table and keeps per-run ids fresh") {
    val md = Metadata.fromJson(s"""{
      "environment": { "name": "t", "root_folder": "/tmp/x",
        "settings": { "log_table": "graft_md_logs_$runTag" } },
      "connections": [], "entities": [] }""")
    val l1 = md.runLogger(spark).get
    val l2 = md.runLogger(spark).get
    l1.runId should not be l2.runId // fresh run id per processing run
    l1.info("graft.test", "a"); l1.close()
    l2.info("graft.test", "b"); l2.close()
    spark.table(s"graft_md_logs_$runTag")
      .select("run_id").distinct().count() shouldBe 2
  }

  test("concurrent appends from parallel runs lose no log rows") {
    // Runner.parallelism model: many entities logging through ONE shared
    // sink; flush jobs serialize on the sink's write lock so concurrent
    // threshold flushes cannot clobber each other's staging files
    val path = tmp() + "/clogs"
    val sink = new ParquetLogSink(spark, path, flushThreshold = 5)
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        val logger = new RunLogger(sink)
        (1 to 25).foreach(i => logger.info("graft.test", s"t$t-m$i", entityId = t))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    sink.flush()
    val rows = sink.read()
    rows.count() shouldBe 100
    rows.select("run_id").distinct().count() shouldBe 4
  }

  test("datafactory: enabled entities serialized with resolved locations") {
    implicit val md: Metadata = Metadata.fromJson("""{
      "environment": { "name": "t", "root_folder": "/data" },
      "connections": [ { "name": "c1" }, { "name": "dead", "enabled": false } ],
      "entities": [
        { "id": 1, "name": "cust", "connection": "c1", "group": "g1",
          "processtype": "merge",
          "watermark": [ { "column": "seq" } ],
          "columns": [ { "name": "id", "fieldroles": ["businesskey"] } ] },
        { "id": 2, "name": "ord", "connection": "c1", "group": "g2",
          "settings": { "silver_table": "silver.orders" } },
        { "id": 3, "name": "gone", "connection": "dead", "group": "g1" },
        { "id": 4, "name": "off", "connection": "c1", "group": "g1",
          "enabled": false }
      ]
    }""")

    val g1 = DataFactory.getConfigItems(DataFactory.ByGroup("g1"))
    g1 should include(""""name":"cust"""")
    g1 should not include """"name":"gone""""  // disabled connection
    g1 should not include """"name":"off""""   // disabled entity
    g1 should include("/data/bronze/c1/cust")
    g1 should include(""""watermark":["seq"]""")

    val byConn = DataFactory.getConfigItems(DataFactory.ByConnection("c1"))
    byConn should include(""""name":"ord"""")
    byConn should include(""""type":"table"""")
    byConn should include("silver.orders")

    DataFactory.getConfigItems(DataFactory.ById(1)) should include(""""id":1""")
    DataFactory.getConfigItems(DataFactory.ByConnectionGroup("c1", "g2")) should
      include(""""name":"ord"""")
  }
}
