package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Symlink-format manifest export (Delta `GENERATE
  * symlink_format_manifest`): point-in-time file lists for external
  * engines without a graft reader. */
class SymlinkManifestSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-symlink").toString

  def lines(p: String): Seq[String] =
    scala.io.Source.fromFile(p).getLines().toSeq

  test("unpartitioned: one manifest whose URIs reproduce the snapshot") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1L to 100L).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(3))
    t.append((101L to 120L).map(i => (i, s"v$i")).toDF("k", "s"))
    val ms = t.generateSymlinkManifest()
    ms.size shouldBe 1
    val uris = lines(ms.head)
    uris.size shouldBe t.manifest.get.files.size
    val reread = spark.read.parquet(uris.map(u => new java.net.URI(u).getPath): _*)
    reread.count() shouldBe 120
    reread.select("k").as[Long].collect().sorted shouldBe (1L to 120L).toArray
  }

  test("partitioned: per-partition manifests; regeneration drops stale partitions") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/p")
    t.overwriteAll(
      Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "p"),
      partitionBy = Seq("p"))
    val ms = t.generateSymlinkManifest()
    ms.size shouldBe 3
    all(ms) should include("_symlink_format_manifest/p=")
    // drop partition c, regenerate: its manifest dir must disappear
    t.delete("p = 'c'")
    val ms2 = t.generateSymlinkManifest()
    ms2.size shouldBe 2
    ms2.exists(_.contains("p=c")) shouldBe false
    new java.io.File(
      t.rootPath + "/_symlink_format_manifest/p=c").exists() shouldBe false
    // every listed file really holds only its partition's rows
    val aUris = lines(ms2.find(_.contains("p=a")).get)
      .map(u => new java.net.URI(u).getPath)
    spark.read.parquet(aUris: _*).select("p").distinct().collect()
      .map(_.getString(0)).toSeq shouldBe Seq("a")
  }

  test("refuses DV-carrying snapshots and column-mapped tables") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/dv")
    t.overwriteAll((1L to 50L).map(i => (i, i)).toDF("k", "v"))
    spark.conf.set("spark.graft.dv.enabled", "true")
    try t.delete("k = 7") finally
      spark.conf.set("spark.graft.dv.enabled", "false")
    a[MetadataException] should be thrownBy t.generateSymlinkManifest()
    t.purgeDeletionVectors()
    t.generateSymlinkManifest().size shouldBe 1
    t.renameColumn("v", "value") // activates column mapping
    a[MetadataException] should be thrownBy t.generateSymlinkManifest()
  }
}
