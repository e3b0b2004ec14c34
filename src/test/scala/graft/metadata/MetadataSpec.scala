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

  test("secure entities get the container suffix on bronze/silver paths") {
    val md = Metadata.fromJson("""{
      "environment": { "name": "sec", "root_folder": "/lake",
                       "secure_container_suffix": "-secure" },
      "connections": [ { "name": "erp" } ],
      "entities": [
        { "id": 1, "name": "salary", "connection": "erp", "secure": true },
        { "id": 2, "name": "orders", "connection": "erp" },
        { "id": 3, "name": "custom", "connection": "erp", "secure": true,
          "settings": { "bronze_path": "${root_folder}/bronze/x/${entity}",
                        "silver_path": "${root_folder}/silver/x/${entity}" } }
      ] }""")
    val e1 = md.getEntity(1)
    e1.isSecure shouldBe true
    md.bronzePath(e1) shouldBe "/lake/bronze-secure/erp/salary"
    md.silverLocation(e1) shouldBe PathLocation("/lake/silver-secure/erp/salary")
    // non-secure entity in the same environment: no suffix
    md.bronzePath(md.getEntity(2)) shouldBe "/lake/bronze/erp/orders"
    // per-entity path overrides are suffixed the same way
    md.bronzePath(md.getEntity(3)) shouldBe "/lake/bronze-secure/x/custom"
    md.silverLocation(md.getEntity(3)) shouldBe
      PathLocation("/lake/silver-secure/x/custom")
    // a root folder segment named like a layer must NOT take the suffix —
    // only the layer directory below the root does
    val md3 = Metadata.fromJson("""{
      "environment": { "name": "sec", "root_folder": "/mnt/bronze",
                       "secure_container_suffix": "-secure" },
      "connections": [ { "name": "erp" } ],
      "entities": [ { "id": 1, "name": "salary", "connection": "erp",
                      "secure": true } ] }""")
    md3.bronzePath(md3.getEntity(1)) shouldBe "/mnt/bronze/bronze-secure/erp/salary"
    // without a configured suffix, secure is a no-op
    val md2 = Metadata.fromJson("""{
      "environment": { "name": "nosuffix", "root_folder": "/lake" },
      "connections": [ { "name": "erp" } ],
      "entities": [ { "id": 1, "name": "salary", "connection": "erp",
                      "secure": true } ] }""")
    md2.bronzePath(md2.getEntity(1)) shouldBe "/lake/bronze/erp/salary"
  }

  test("entity column filter selects by fieldrole and expression presence") {
    val e = Metadata.fromJson(baseJson).getEntity(1)
    e.selectColumns(EntityColumnFilter("businesskey")).map(_.name) shouldBe
      Seq("cust id")
    e.selectColumns(EntityColumnFilter(hasExpression = true)).map(_.name) shouldBe
      Seq("calc")
    e.selectColumns(EntityColumnFilter(hasExpression = false))
      .map(_.name) should contain("amount")
    // multiple roles = ANY-of
    e.selectColumns(EntityColumnFilter("businesskey", "partition"))
      .map(_.name) shouldBe Seq("cust id")
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

  test("load-time contract: unknown connection references and keyless " +
      "keyed-processtype entities fail with the entity named") {
    // a typo'd connection would silently drop its settings cascade
    val e1 = intercept[MetadataException](Metadata.fromJson("""{
      "environment": { "name": "e", "root_folder": "/r" },
      "connections": [ { "name": "c" } ],
      "entities": [ { "id": 1, "name": "a", "connection": "NOPE",
        "columns": [ { "name": "ID", "fieldroles": ["businesskey"] } ] } ] }"""))
    e1.getMessage should include("'a'")
    e1.getMessage should include("'NOPE'")
    // merge/historic without a businesskey would only fail rounds later
    // inside the merge plan with an unresolved-column error
    val e2 = intercept[MetadataException](Metadata.fromJson("""{
      "environment": { "name": "e", "root_folder": "/r" },
      "connections": [ { "name": "c" } ],
      "entities": [ { "id": 1, "name": "nk", "connection": "c",
        "processtype": "merge",
        "columns": [ { "name": "ID" } ] } ] }"""))
    e2.getMessage should include("businesskey")
    e2.getMessage should include("'nk'")
  }

  test("load-time contract checks skip DISABLED entities: one parked " +
      "entity (or one on a disabled connection) cannot block the load") {
    // entity-level disabled + unknown connection: loads (warn only)
    val md = Metadata.fromJson("""{
      "environment": { "name": "e", "root_folder": "/r" },
      "connections": [ { "name": "c" } ],
      "entities": [
        { "id": 1, "name": "live", "connection": "c",
          "columns": [ { "name": "ID", "fieldroles": ["businesskey"] } ] },
        { "id": 2, "name": "parked", "connection": "GONE", "enabled": false,
          "columns": [ { "name": "ID" } ] } ] }""")
    md.getEntity(1).name shouldBe "live"
    md.isEnabled(md.getEntity(2)) shouldBe false
    // an entity with NO connection field at all, disabled: also loads
    Metadata.fromJson("""{
      "environment": { "name": "e", "root_folder": "/r" },
      "connections": [ { "name": "c" } ],
      "entities": [
        { "id": 3, "name": "stray", "enabled": false,
          "processtype": "merge",
          "columns": [ { "name": "ID" } ] } ] }""").entities should have size 1
    // a keyless merge entity on a DISABLED connection: loads (warn only)
    Metadata.fromJson("""{
      "environment": { "name": "e", "root_folder": "/r" },
      "connections": [ { "name": "off", "enabled": false } ],
      "entities": [
        { "id": 4, "name": "offline", "connection": "off",
          "processtype": "merge",
          "columns": [ { "name": "ID" } ] } ] }""").entities should have size 1
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
