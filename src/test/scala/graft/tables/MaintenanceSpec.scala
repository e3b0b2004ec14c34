package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.core.SchemaDrift
import graft.metadata.Metadata

class MaintenanceSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._
  def tmp(): String = Files.createTempDirectory("graft-maint").toString

  test("compact merges small files per partition, preserves data + history") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "v", "p"), Seq("p"))
    t.append(Seq((3, "c", "x")).toDF("id", "v", "p"))
    t.append(Seq((4, "d", "x")).toDF("id", "v", "p"))
    val before = t.manifest.get.files
    before.count(_.partitionValues.get("p").contains("x")) shouldBe 3
    val yFiles = before.filter(_.partitionValues.get("p").contains("y"))

    t.compact()
    val after = t.manifest.get.files
    after.count(_.partitionValues.get("p").contains("x")) shouldBe 1
    // partition y had one file: untouched, same physical file
    after.filter(_.partitionValues.get("p").contains("y")) shouldBe yFiles
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3, 4)
    // previous version still readable (time travel preserved until vacuum)
    t.readVersion(t.currentVersion.get - 1).count() shouldBe 4
  }

  test("compact on unpartitioned table coalesces to target file count") {
    val t = ManagedTable(spark, tmp() + "/t2")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.manifest.get.files.size should be >= 3
    t.compact()
    t.manifest.get.files.size shouldBe 1
    t.read().count() shouldBe 3
  }

  test("jdbc metadata loader reads config from a database") {
    val url = "jdbc:derby:memory:graftmeta;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE cfg (config VARCHAR(4000))")
    st.execute("""INSERT INTO cfg VALUES ('{
      "environment": { "name": "fromdb", "root_folder": "/data" },
      "connections": [ { "name": "c1" } ],
      "entities": [ { "id": 5, "name": "dbent", "connection": "c1" } ] }')""")
    conn.close()

    val md = Metadata.fromJdbc(spark, url, "SELECT config FROM cfg")
    md.environment.name shouldBe "fromdb"
    md.getEntity(5).name shouldBe "dbent"
  }

  test("data skipping: manifest stats prune files outside the range") {
    import org.apache.spark.sql.functions.col
    val t = ManagedTable(spark, tmp() + "/skip")
    // range-partitioned write → each file covers a disjoint seq range
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("seq", "v")
      .repartitionByRange(4, col("seq"))
    t.overwriteAll(df)
    val files = t.manifest.get.files
    files.size shouldBe 4
    // every file carries long stats for seq and string stats for v
    files.foreach { f =>
      f.stats("seq").typ shouldBe "long"
      f.stats("v").typ shouldBe "string"
    }
    // a 50-wide range inside one quartile keeps exactly one file
    t.filesInRange("seq", Some(300L), Some(320L)).size shouldBe 1
    // open-ended ranges work
    t.filesInRange("seq", Some(900L), None).size shouldBe 1
    t.filesInRange("seq", None, None).size shouldBe 4
    // unknown column: conservatively keeps everything
    t.filesInRange("nope", Some(1), Some(2)).size shouldBe 4
    // result equals a full-scan filter
    t.readRange("seq", Some(300L), Some(320L))
      .collect().map(_.getLong(0)).sorted shouldBe (300L to 320L).toArray
  }

  test("crashed writes are invisible: stray data files never reach readers") {
    val t = ManagedTable(spark, tmp() + "/atomic")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    // simulate a writer that died after producing files but before commit:
    // drop a parquet file into the data area with no manifest reference
    Seq((99, "ghost")).toDF("id", "v").coalesce(1)
      .write.parquet(t.rootPath + "/data/deadbeef-crashed-commit")
    t.read().collect().map(_.getInt(0)) shouldBe Array(1) // reader unaffected
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    // vacuum clears the orphaned commit
    t.vacuum()
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
  }

  test("schema drift: new vs missing columns reported by name") {
    val src = Seq((1, "a", 2.0)).toDF("id", "name", "extra").schema
    val tgt = Seq((1, "a", true)).toDF("id", "name", "flag").schema
    val drift = SchemaDrift.compare(src, tgt)
    drift should contain(SchemaDrift.Drift("extra", SchemaDrift.NewColumn))
    drift should contain(SchemaDrift.Drift("flag", SchemaDrift.MissingColumn))
    SchemaDrift.compare(src, src) shouldBe empty
  }
}
