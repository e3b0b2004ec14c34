package graft.metadata

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DecimalType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.{Files, Paths}

class MetadataSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val baseJson = """{
    "environment": {
      "name": "prod", "timezone": "Europe/Amsterdam", "root_folder": "/lake",
      "systemfield_prefix": "dl_",
      "settings": { "tier": "gold", "region": "eu" }
    },
    "connections": [
      { "name": "erp", "settings": { "tier": "silver", "schema": "dbo" } },
      { "name": "crm", "enabled": false }
    ],
    "entities": [
      { "id": 1, "name": "customer", "connection": "erp", "group": "core",
        "processtype": "delta",
        "settings": { "tier": "bronze" },
        "watermark": { "column": "seq" },
        "columns": [
          { "name": "cust id", "newname": "cust_id", "datatype": "integer",
            "fieldroles": ["businesskey"] },
          { "name": "amount", "datatype": "decimal(10,2)" },
          { "name": "weird", "datatype": "whatisthis" },
          { "name": "frac", "datatype": "decimal" },
          { "name": "calc", "datatype": "string",
            "expression": "concat(cust_id, '!')" }
        ],
        "transformations": [ "SELECT *", { "expressions": ["*", "1 AS one"] } ] },
      { "id": 2, "name": "lead", "connection": "crm", "destination": "leads",
        "settings": { "silver_table": "silver.${destination}" } }
    ]
  }"""

  test("parse: process types, watermarks, transformations, destination") {
    val md = Metadata.fromJson(baseJson)
    val e = md.getEntity(1)
    e.processType shouldBe ProcessType.Merge // legacy "delta" → Merge
    e.watermark.map(_.columnName) shouldBe Seq("seq")
    e.transformations.map(_.expressions) shouldBe
      Seq(Seq("SELECT *"), Seq("*", "1 AS one"))
    md.getEntity(2).destination shouldBe "leads"
    e.primaryKeyColumnName shouldBe "PK_customer"
    e.businessKeyColumns shouldBe Seq("cust_id") // post-rename name
  }

  test("type parsing: decimal default, unknown → string") {
    val cols = Metadata.fromJson(baseJson).getEntity(1).columns
    cols.find(_.name == "amount").get.dataType shouldBe Some(DecimalType(10, 2))
    cols.find(_.name == "frac").get.dataType shouldBe Some(DecimalType(38, 18))
    cols.find(_.name == "weird").get.dataType shouldBe Some(StringType)
    ProcessType.parse("historic") shouldBe ProcessType.Historic
    intercept[ProcessStrategyNotSupportedException](ProcessType.parse("nope"))
  }

  test("settings cascade environment → connection → entity") {
    val md = Metadata.fromJson(baseJson)
    import org.json4s._
    (md.resolvedSettings(md.getEntity(1)) \ "tier") shouldBe JString("bronze")
    (md.resolvedSettings(md.getEntity(1)) \ "region") shouldBe JString("eu")
    (md.resolvedSettings(md.getEntity(1)) \ "schema") shouldBe JString("dbo")
    (md.resolvedSettings(md.getEntity(2)) \ "tier") shouldBe JString("gold")
  }

  test("path interpolation + output resolution") {
    val md = Metadata.fromJson(baseJson)
    val e1 = md.getEntity(1)
    md.bronzePath(e1) shouldBe "/lake/bronze/erp/customer"
    md.silverLocation(e1) shouldBe PathLocation("/lake/silver/erp/customer")
    md.silverLocation(md.getEntity(2)) shouldBe TableLocation("silver.leads")
    md.interpolate("${root_folder}/x/${settings_schema}/${entity}", e1) shouldBe
      "/lake/x/dbo/customer"
    // unknown vars left intact
    md.interpolate("${nope}", e1) shouldBe "${nope}"
  }

  test("enabled = entity.enabled AND connection.enabled; lookups + errors") {
    val md = Metadata.fromJson(baseJson)
    md.isEnabled(md.getEntity(1)) shouldBe true
    md.isEnabled(md.getEntity(2)) shouldBe false // crm disabled
    md.getEntitiesByConnection("ERP").map(_.id) shouldBe Seq(1)
    md.getEntitiesByGroup("core").map(_.id) shouldBe Seq(1)
    md.getConnection("erp").name shouldBe "erp"
    intercept[EntityNotFoundException](md.getEntity(99))
    intercept[ConnectionNotFoundException](md.getConnection("nope"))
  }

  test("duplicate entity ids rejected") {
    intercept[MetadataException](Metadata.fromJson("""{
      "entities": [ { "id": 1, "name": "a" }, { "id": 1, "name": "b" } ] }"""))
  }

  test("file and folder loaders; folder merge combines sections") {
    val dir = Files.createTempDirectory("graft-md")
    Files.writeString(Paths.get(dir.toString, "01_env.json"),
      """{ "environment": { "name": "merged", "root_folder": "/m" },
          "connections": [ { "name": "c1" } ] }""")
    Files.writeString(Paths.get(dir.toString, "02_entities.json"),
      """{ "entities": [ { "id": 7, "name": "e7", "connection": "c1" } ] }""")
    Files.writeString(Paths.get(dir.toString, "ignore.txt"), "not json")

    val md = Metadata.fromFolder(spark, dir.toString)
    md.environment.name shouldBe "merged"
    md.getEntity(7).name shouldBe "e7"

    val single = Files.createTempFile("graft-md", ".json")
    Files.writeString(single, baseJson)
    Metadata.fromFile(spark, single.toString).getEntity(1).name shouldBe "customer"
  }
}
