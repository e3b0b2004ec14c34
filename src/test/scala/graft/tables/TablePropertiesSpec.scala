package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Table properties (Delta TBLPROPERTIES): manifest-versioned per-table
  * configuration — `graft.*` keys override the matching `spark.graft.*`
  * session conf for that one table, so behavior travels WITH the table
  * instead of depending on every session being configured alike. */
class TablePropertiesSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-props").toString

  def seed(path: String): ManagedTable = {
    import spark.implicits._
    val t = ManagedTable(spark, path)
    t.overwriteAll((1 to 40).map(i => (i, s"n$i")).toDF("id", "name"))
    t
  }

  test("set/unset round-trip; carry forward across data commits; " +
      "versioned under time travel") {
    val t = seed(tmp() + "/p1")                                  // v0
    t.setTableProperties(Map("owner" -> "ops", "graft.x" -> "1")) // v1
    t.properties shouldBe Map("owner" -> "ops", "graft.x" -> "1")
    import spark.implicits._
    t.append(Seq((41, "n41")).toDF("id", "name"))                // v2
    t.properties shouldBe Map("owner" -> "ops", "graft.x" -> "1")
    t.unsetTableProperties(Seq("graft.x", "absent"))             // v3
    t.properties shouldBe Map("owner" -> "ops")
    // each version reads the configuration it was committed under
    t.readManifest(0).properties shouldBe empty
    t.readManifest(2).properties.keySet shouldBe Set("owner", "graft.x")
    // overwrite preserves them (table-level governance)
    t.overwriteAll(Seq((1, "z")).toDF("id", "name"))
    t.properties shouldBe Map("owner" -> "ops")
  }

  test("graft.dv.enabled as a TABLE property flips DML to deletion " +
      "vectors without any session conf") {
    val t = seed(tmp() + "/p2")
    spark.conf.get("spark.graft.dv.enabled", "false") shouldBe "false"
    t.setTableProperties(Map("graft.dv.enabled" -> "true"))
    t.delete("id % 7 = 0") shouldBe 5L
    // masked, not rewritten: at least one entry carries a DV reference
    t.manifest.get.files.count(_.dv.isDefined) should be >= 1
    t.read().count() shouldBe 35L
    // a second table in the same session stays on the classic path
    val t2 = seed(tmp() + "/p2b")
    t2.delete("id % 7 = 0") shouldBe 5L
    t2.manifest.get.files.flatMap(_.dv) shouldBe empty
  }

  test("graft.autoCompact.enabled bounds small-file growth under a " +
      "drip of appends") {
    import spark.implicits._
    val t = seed(tmp() + "/p4")
    t.setTableProperties(Map(
      "graft.autoCompact.enabled" -> "true",
      "graft.autoCompact.minSmallFiles" -> "4"))
    (100 to 120).foreach(i => t.append(Seq((i, s"n$i")).toDF("id", "name")))
    t.read().count() shouldBe 61L
    // without auto-compact 21 appends leave 20+ small files; with it the
    // manifest stays bounded by the trigger threshold
    t.manifest.get.files.size should be < 8
    t.history().map(_.operation).count(_.startsWith("compactSmall")) should be >= 1
    // a table without the property grows linearly
    val t2 = seed(tmp() + "/p4b")
    (100 to 110).foreach(i => t2.append(Seq((i, s"n$i")).toDF("id", "name")))
    t2.manifest.get.files.size should be >= 11
  }

  test("graft.write.optimize collapses a partitioned write to one file " +
      "per partition (salted for parallelism when asked)") {
    import spark.implicits._
    val rows = (1 to 4000).map(i => (i, s"p${i % 4}")).toDF("id", "part")
      .repartition(8) // 8 upstream tasks × 4 partitions = naive 32 files
    val t = ManagedTable(spark, tmp() + "/p5")
    t.overwriteAll(rows, partitionBy = Seq("part"))
    t.manifest.get.files.size should be > 8 // the explosion, demonstrated
    val t2 = ManagedTable(spark, tmp() + "/p5b")
    t2.overwriteAll(rows.limit(0), partitionBy = Seq("part"))
    t2.setTableProperties(Map("graft.write.optimize" -> "true"))
    t2.overwriteAll(rows, partitionBy = Seq("part"))
    t2.manifest.get.files.size shouldBe 4 // one per partition
    t2.read().count() shouldBe 4000L
    // salted: a giant partition may write through N tasks
    val t3 = ManagedTable(spark, tmp() + "/p5c")
    t3.overwriteAll(rows.limit(0), partitionBy = Seq("part"))
    t3.setTableProperties(Map("graft.write.optimize" -> "true",
      "graft.write.filesPerPartition" -> "2"))
    t3.overwriteAll(rows, partitionBy = Seq("part"))
    val perPart = t3.manifest.get.files.groupBy(_.partitionValues("part"))
    perPart.values.foreach(_.size should be <= 2)
    t3.read().count() shouldBe 4000L
  }

  test("shallow clone carries properties") {
    val t = seed(tmp() + "/p3")
    t.setTableProperties(Map("graft.dv.enabled" -> "true", "owner" -> "a"))
    val clone = t.shallowCloneTo(tmp() + "/p3c")
    clone.properties shouldBe t.properties
  }

  test("graft.appendOnly rejects mutations of existing rows; appends, " +
      "inserts and maintenance still run") {
    import spark.implicits._
    val t = seed(tmp() + "/ao")
    t.setTableProperties(Map("graft.appendOnly" -> "true"))
    a[graft.metadata.MetadataException] should be thrownBy t.delete("id = 1")
    a[graft.metadata.MetadataException] should be thrownBy
      t.update(Map("name" -> "'x'"))
    a[graft.metadata.MetadataException] should be thrownBy t.truncate()
    a[graft.metadata.MetadataException] should be thrownBy
      t.overwriteAll(Seq((9, "z")).toDF("id", "name"))
    a[graft.metadata.MetadataException] should be thrownBy
      MergeInto.byKey(t, Seq((1, "u")).toDF("id", "name"), "id")
        .whenMatchedUpdateAll().execute()
    val before = t.read().count()
    // allowed: append, insert-only merge, compaction
    t.append(Seq((100, "new")).toDF("id", "name"))
    MergeInto.byKey(t, Seq((200, "ins")).toDF("id", "name"), "id")
      .whenNotMatchedInsertAll().execute()
    t.compact()
    t.read().count() shouldBe before + 2
    // and the property can be lifted again
    t.setTableProperties(Map("graft.appendOnly" -> "false"))
    t.delete("id = 100") shouldBe 1L
  }
}
