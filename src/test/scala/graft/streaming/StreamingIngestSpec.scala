package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.metadata.Metadata
import graft.pipeline.Processing

class StreamingIngestSpec extends AnyFunSuite with Matchers {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("streaming ingest: slices merge exactly once, new files picked up incrementally") {
    val root = Files.createTempDirectory("graft-stream").toString
    val md = Metadata.fromJson(s"""{
      "environment": { "name": "t", "timezone": "UTC", "root_folder": "$root" },
      "connections": [ { "name": "c1" } ],
      "entities": [
        { "id": 1, "name": "cust", "connection": "c1", "processtype": "merge",
          "columns": [
            { "name": "ID", "datatype": "integer", "fieldroles": ["businesskey"] },
            { "name": "name", "datatype": "string" } ] } ]
    }""")
    val e = md.getEntity(1)
    StreamingIngest.validate(e)
    val bronze = md.bronzePath(e)
    val checkpoint = s"$root/checkpoint"

    Seq((1, "a"), (2, "b")).toDF("ID", "name")
      .coalesce(1).write.parquet(s"$bronze/s1.parquet")
    Seq((2, "B2"), (3, "c")).toDF("ID", "name")
      .coalesce(1).write.parquet(s"$bronze/s2.parquet")

    val summaries = StreamingIngest.ingestAvailable(md, e, checkpoint)
    summaries.map(_.strategy).distinct shouldBe Seq("merge")

    val table = new Processing(md, e, "x").table.read()
    table.select("ID", "name").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1) shouldBe
      Array((1, "a"), (2, "B2"), (3, "c"))

    // incremental restart: only the new slice is processed
    Seq((4, "d")).toDF("ID", "name")
      .coalesce(1).write.parquet(s"$bronze/s3.parquet")
    val round2 = StreamingIngest.ingestAvailable(md, e, checkpoint)
    round2.map(_.recordsInSlice).sum shouldBe 1

    new Processing(md, e, "x").table.read().count() shouldBe 4
  }

  test("streaming validate rejects full-overwrite entities") {
    val md = Metadata.fromJson("""{
      "environment": { "name": "t", "root_folder": "/tmp/x" },
      "connections": [ { "name": "c1" } ],
      "entities": [ { "id": 1, "name": "e1", "connection": "c1",
                      "processtype": "full" } ]
    }""")
    intercept[IllegalArgumentException](StreamingIngest.validate(md.getEntity(1)))
  }
}
