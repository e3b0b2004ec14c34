package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.metadata.Metadata

/** Strategy throughput at the reference's own benchmark scale (10,000-row
  * slices; reference: src/test/scala/datalake/processing/
  * BenchmarkSpec.scala:8-69). Mirrors its contract: timings are reported
  * via info(), asserted only non-negative — regressions show up in CI
  * logs, not as flaky failures. */
class PipelineBenchmarkSpec extends AnyFunSuite with Matchers {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  val Rows = 10000

  def fixture(processType: String): (Metadata, Int) = {
    val root = Files.createTempDirectory("graft-bench").toString
    val md = Metadata.fromJson(s"""{
      "environment": { "name": "bench", "timezone": "UTC", "root_folder": "$root" },
      "connections": [ { "name": "c1" } ],
      "entities": [
        { "id": 1, "name": "b_$processType", "connection": "c1",
          "processtype": "$processType",
          "columns": [
            { "name": "ID", "datatype": "integer", "fieldroles": ["businesskey"] },
            { "name": "data", "datatype": "string" } ] } ]
    }""")
    (md, 1)
  }

  def slice(version: Int) =
    (1 to Rows).map(i => (i, s"payload_${version}_${i % 997}")).toDF("ID", "data")

  def writeAndRun(md: Metadata, slice0: Int, name: String, time: String): Long = {
    val e = md.getEntity(1)
    slice(slice0).coalesce(2).write.mode("overwrite")
      .parquet(s"${md.bronzePath(e)}/s$slice0.parquet")
    val t0 = System.nanoTime()
    val summary = new Processing(md, e, s"s$slice0.parquet",
      Map("processing.time" -> time)).process()
    val ms = (System.nanoTime() - t0) / 1000000
    info(f"$name: $ms ms (${summary.inserted} ins / ${summary.updated} upd " +
      f"/ ${summary.unchanged} unch)")
    ms
  }

  test(s"full load, $Rows rows") {
    val (md, _) = fixture("full")
    writeAndRun(md, 0, "full initial", "2024-01-10T10:00:00") should be >= 0L
    writeAndRun(md, 1, "full overwrite", "2024-01-11T10:00:00") should be >= 0L
  }

  test(s"merge upsert, $Rows-row slice onto $Rows-row table") {
    val (md, _) = fixture("merge")
    writeAndRun(md, 0, "merge first run", "2024-01-10T10:00:00") should be >= 0L
    writeAndRun(md, 1, "merge upsert", "2024-01-11T10:00:00") should be >= 0L
    val e = md.getEntity(1)
    new Processing(md, e, "x").table.read().count() shouldBe Rows
  }

  test(s"historic SCD2, $Rows-row slice") {
    val (md, _) = fixture("historic")
    writeAndRun(md, 0, "historic first run", "2024-01-10T10:00:00") should be >= 0L
    writeAndRun(md, 1, "historic versions", "2024-01-11T10:00:00") should be >= 0L
    val e = md.getEntity(1)
    // every key changed payload → closed + new version per key
    new Processing(md, e, "x").table.read().count() shouldBe Rows * 2
  }
}
