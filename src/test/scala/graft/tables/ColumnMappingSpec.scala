package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.metadata.MetadataException

/** Column mapping: RENAME/DROP/ADD COLUMN as metadata-only commits —
  * logical names decouple from the physical names stored inside parquet
  * files (Delta's columnMapping.mode=name), so at 100 TB a rename
  * rewrites zero bytes. */
class ColumnMappingSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-cm").toString

  def df(rows: Seq[(Int, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "part")
  }

  def dataPaths(t: ManagedTable): Set[String] =
    t.manifest.get.files.map(_.path).toSet

  test("rename is metadata-only: same files, new name, time travel keeps the old") {
    val t = ManagedTable(spark, tmp() + "/cm1")
    t.overwriteAll(df((1 to 50).map(i => (i, s"n$i", "x"))))
    val before = dataPaths(t)
    t.renameColumn("name", "title")
    dataPaths(t) shouldBe before // zero bytes rewritten
    t.read().columns.toSeq shouldBe Seq("id", "title", "part")
    t.read().filter("id = 7").head.getString(1) shouldBe "n7"
    t.read().count() shouldBe 50L
    // the pre-rename version still reads under its own (old) name
    t.readVersion(0).columns.toSeq shouldBe Seq("id", "name", "part")
    t.readVersion(0).filter("id = 7").head.getString(1) shouldBe "n7"
  }

  test("append after rename writes the stable physical name") {
    val t = ManagedTable(spark, tmp() + "/cm2")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", "x"))))
    t.renameColumn("name", "title")
    val before = dataPaths(t)
    t.append(df(Seq((11, "n11", "x"))).toDF("id", "title", "part"))
    t.read().count() shouldBe 11L
    t.read().filter("id = 11").head.getString(1) shouldBe "n11"
    // the new file stores the PHYSICAL column ("name"), not the logical
    val newPath = (dataPaths(t) -- before).head
    val raw = spark.read.parquet(t.rootPath + "/" + newPath)
    raw.columns should contain("name")
    raw.columns should not contain "title"
  }

  test("drop is metadata-only and a re-added name never resurrects old bytes") {
    val t = ManagedTable(spark, tmp() + "/cm3")
    t.overwriteAll(df((1 to 20).map(i => (i, s"n$i", "x"))))
    val before = dataPaths(t)
    t.dropColumn("name")
    dataPaths(t) shouldBe before
    t.read().columns.toSeq shouldBe Seq("id", "part")
    // re-add a column with the SAME logical name: existing rows must read
    // null, NOT the dropped column's still-on-disk bytes
    t.addColumn("name", StringType)
    t.read().columns.toSeq shouldBe Seq("id", "part", "name")
    t.read().filter(col("name").isNotNull).count() shouldBe 0L
    t.append(df(Seq((21, "fresh", "x"))).select(
      col("id"), col("part"), col("name")))
    t.read().filter("id = 21").select("name").head.getString(0) shouldBe "fresh"
    t.read().filter("id <= 20 AND name IS NOT NULL").count() shouldBe 0L
  }

  test("addColumn: metadata-only, existing rows null-fill") {
    val t = ManagedTable(spark, tmp() + "/cm4")
    t.overwriteAll(df((1 to 5).map(i => (i, s"n$i", "x"))))
    val before = dataPaths(t)
    t.addColumn("score", IntegerType)
    dataPaths(t) shouldBe before
    t.read().filter(col("score").isNull).count() shouldBe 5L
  }

  test("keyed merge works across a renamed column (classic and DV mode)") {
    for (dv <- Seq(false, true)) {
      val t = ManagedTable(spark, tmp() + s"/cm5_$dv")
      t.overwriteAll(df((1 to 30).map(i => (i, s"n$i", "x"))))
      t.renameColumn("name", "title")
      val src = df(Seq((7, "seven", "x"), (31, "new", "x")))
        .toDF("id", "title", "part")
      if (dv) spark.conf.set("spark.graft.dv.enabled", "true")
      try MergeInto.byKey(t, src, "id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      finally if (dv) spark.conf.unset("spark.graft.dv.enabled")
      t.read().count() shouldBe 31L
      t.read().filter("id = 7").head.getString(1) shouldBe "seven"
      t.read().filter("id = 31").head.getString(1) shouldBe "new"
      t.read().filter("id = 8").head.getString(1) shouldBe "n8"
    }
  }

  test("stats skipping and bloom indexes survive a rename (physical keys)") {
    val t = ManagedTable(spark, tmp() + "/cm6")
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))).repartition(4))
    t.addBloomIndex("id", expectedItemsPerFile = 1000)
    t.renameColumn("id", "doc_id")
    // range skipping under the NEW logical name consults the old keys
    val hits = t.filesInRange("doc_id", Some(1), Some(1))
    hits.size should be < t.manifest.get.files.size
    t.readRange("doc_id", Some(5), Some(10)).count() shouldBe 6L
    // bloom-backed point lookup under the new name
    t.readEquals("doc_id", Seq(42)).count() shouldBe 1L
    t.filesMightContain("doc_id", Seq(42)).size should be <= t.manifest.get.files.size
  }

  test("DML and predicate delete after rename") {
    val t = ManagedTable(spark, tmp() + "/cm7")
    t.overwriteAll(df((1 to 40).map(i => (i, s"n$i", "x"))))
    t.renameColumn("name", "title")
    t.delete("id <= 10") shouldBe 10L
    t.update(Map("title" -> "upper(title)"), "id = 11") shouldBe 1L
    t.read().count() shouldBe 30L
    t.read().filter("id = 11").head.getString(1) shouldBe "N11"
  }

  test("guards: partition column, constraints, duplicates") {
    val t = ManagedTable(spark, tmp() + "/cm8")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", s"p${i % 2}"))), Seq("part"))
    intercept[MetadataException] { t.renameColumn("part", "bucket") }
    intercept[MetadataException] { t.dropColumn("part") }
    intercept[MetadataException] { t.renameColumn("missing", "x") }
    intercept[MetadataException] { t.renameColumn("id", "NAME") } // CI clash
    t.addConstraint("c_id", "id > 0")
    intercept[MetadataException] { t.renameColumn("id", "doc_id") }
    intercept[MetadataException] { t.dropColumn("id") }
    t.dropConstraint("c_id")
    t.renameColumn("id", "doc_id")
    t.read().columns should contain("doc_id")
  }

  test("shallow clone carries the mapping; change feed spans a rename") {
    val t = ManagedTable(spark, tmp() + "/cm9")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", "x"))))
    t.renameColumn("name", "title")
    t.append(df(Seq((11, "n11", "x"))).toDF("id", "title", "part"))
    val clone = t.shallowCloneTo(tmp() + "/cm9_clone")
    clone.read().columns.toSeq shouldBe Seq("id", "title", "part")
    clone.read().count() shouldBe 11L
    // change feed across the rename boundary still enumerates the append
    val changes = t.rowChanges(1, 2, Seq("id"))
    changes.filter(col("_change_type") === "insert").count() shouldBe 1L
  }
}
