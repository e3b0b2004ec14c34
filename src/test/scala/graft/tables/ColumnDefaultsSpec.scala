package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Column DEFAULT values (Spark/Delta parity): ADD COLUMN … DEFAULT is a
  * metadata-only commit; files predating the addition read the
  * EXISTS_DEFAULT via their recorded `dataVersion`, writes omitting the
  * column fill the CURRENT_DEFAULT. */
class ColumnDefaultsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-defaults").toString

  def byK(t: ManagedTable): Map[Long, String] =
    t.read().select("k", "tier").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("metadata-only add: old rows read the default, new writes store values") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))   // v0
    val v0Files = t.manifest.get.files.map(_.path).toSet
    t.addColumnWithDefault("tier", StringType, "'standard'")   // v1
    // zero data movement
    t.manifest.get.files.map(_.path).toSet shouldBe v0Files
    byK(t) shouldBe Map(1L -> "standard", 2L -> "standard")
    // a write CARRYING the column stores real values (nulls included)
    t.append(Seq((3L, "c", "gold"), (4L, "d", null))
      .toDF("k", "v", "tier"))                                 // v2
    val m = byK(t)
    m(3L) shouldBe "gold"
    m(4L) shouldBe null // explicit null is NOT the default
    m(1L) shouldBe "standard"
    // a write OMITTING the column fills the current default
    t.append(Seq((5L, "e")).toDF("k", "v"))                    // v3
    byK(t)(5L) shouldBe "standard"
  }

  test("SET DEFAULT changes future fills only; DROP DEFAULT restores strictness") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("k", "v"))
    t.addColumnWithDefault("tier", StringType, "'standard'")
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.setColumnDefault("tier", "'basic'")
    t.append(Seq((3L, "c")).toDF("k", "v"))
    t.dropColumnDefault("tier")
    // without a current default the engine's strict missing-column
    // contract applies again
    a[MetadataException] should be thrownBy
      t.append(Seq((4L, "d")).toDF("k", "v"))
    t.append(Seq((4L, "d", "silver")).toDF("k", "v", "tier"))
    val m = byK(t)
    m(1L) shouldBe "standard" // pre-add: EXISTS_DEFAULT survives SET
    m(2L) shouldBe "standard"
    m(3L) shouldBe "basic"
    m(4L) shouldBe "silver"
  }

  test("defaults survive compaction, DML rewrites, and time travel sees each era") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2))                                          // v0
    t.addColumnWithDefault("bonus", IntegerType, "7")           // v1
    t.append(Seq((21L, "x", 99)).toDF("k", "v", "bonus"))       // v2
    // compaction materializes the defaults physically; values unchanged
    t.compact()                                                 // v3
    val m = t.read().select("k", "bonus").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    (1L to 20L).foreach(k => m(k) shouldBe 7)
    m(21L) shouldBe 99
    // copy-on-write UPDATE over defaulted rows reads the default in its
    // predicate and keeps it for untouched rows
    t.update(Map("v" -> "'upd'"), "bonus = 7 AND k = 5") shouldBe 1L
    t.read().filter("k = 5").select("v", "bonus").collect()(0)
      .toSeq shouldBe Seq("upd", 7)
    // time travel: v0 has no bonus column at all
    t.readVersion(0).columns should not contain "bonus"
    t.readVersion(2).filter("k = 1").select("bonus")
      .collect()(0).getInt(0) shouldBe 7
  }

  test("constants only: column refs, nondeterminism, bad casts all rejected") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("k", "v"))
    a[MetadataException] should be thrownBy
      t.addColumnWithDefault("c", IntegerType, "k + 1")
    a[MetadataException] should be thrownBy
      t.addColumnWithDefault("c", IntegerType, "rand()")
    a[MetadataException] should be thrownBy
      t.addColumnWithDefault("c", IntegerType, "not_a_function(")
    // a castable constant expression is fine
    t.addColumnWithDefault("c", IntegerType, "2 + 3")
    t.read().select("c").collect()(0).getInt(0) shouldBe 5
  }
}
