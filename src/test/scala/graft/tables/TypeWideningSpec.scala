package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Metadata-only type widening (Delta's type-widening feature):
  * `alterColumnType` commits a wider schema without rewriting a byte —
  * narrow parquet pages are read through the wider manifest schema, and
  * stats/bloom skipping stays correct across the boundary. */
class TypeWideningSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-widen").toString

  test("int->long and float->double widen without touching files") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x"))   // v0 narrow
    val v0Files = t.manifest.get.files.map(_.path).toSet
    t.alterColumnType("k", LongType)                            // v1
    t.alterColumnType("x", DoubleType)                          // v2
    t.manifest.get.files.map(_.path).toSet shouldBe v0Files
    t.read().schema("k").dataType shouldBe LongType
    t.read().schema("x").dataType shouldBe DoubleType
    // old narrow pages read through the wide schema
    t.read().orderBy("k").collect().map(_.toSeq).toSeq shouldBe
      Seq(Seq(1L, 1.5d), Seq(2L, 2.5d))
    // a wide append now stores values beyond the narrow domain
    t.append(Seq((10000000000L, 3.5d)).toDF("k", "x"))
    t.read().filter("k > 2147483647").count() shouldBe 1L
    // time travel sees the narrow era's schema
    t.readVersion(0).schema("k").dataType shouldBe IntegerType
  }

  test("narrowing and incompatible changes are rejected; same-type is a no-op") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1L, "a", 2.0d)).toDF("k", "v", "x"))
    a[MetadataException] should be thrownBy t.alterColumnType("k", IntegerType)
    a[MetadataException] should be thrownBy t.alterColumnType("v", IntegerType)
    a[MetadataException] should be thrownBy t.alterColumnType("x", FloatType)
    a[MetadataException] should be thrownBy t.alterColumnType("nope", LongType)
    val v = t.manifest.get.version
    t.alterColumnType("k", LongType) // already long: no commit
    t.manifest.get.version shouldBe v
  }

  test("stats skipping stays correct across the widening boundary") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    // two narrow files with disjoint ranges
    t.overwriteAll((1 to 100).map(i => (i, s"a$i")).toDF("k", "v").coalesce(1))
    t.append((1000 to 1100).map(i => (i, s"b$i")).toDF("k", "v").coalesce(1))
    t.alterColumnType("k", LongType)
    t.append(Seq((5000000000L, "wide")).toDF("k", "v").coalesce(1))
    // a long-typed range probe against files whose stats were written as
    // ints still prunes: only the matching narrow file survives
    val hit = t.filesInRange("k", Some(1000L), Some(1100L))
    hit.size shouldBe 1
    // and the wide file is found by a beyond-int probe
    t.filesInRange("k", Some(4000000000L), None).size shouldBe 1
    // row-level answers agree with a full filter
    t.readRange("k", Some(1000L), Some(1100L)).count() shouldBe 101L
  }

  test("bloom sidecars built narrow answer wide probes") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 500).map(i => (i, i % 7)).toDF("k", "g")
      .repartition(3))
    t.addBloomIndex("k", expectedItemsPerFile = 1000L)
    t.alterColumnType("k", LongType)
    // probe with a Long value against int-built sidecars: canonical
    // domain is long for every integral width, so this is exact
    val files = t.filesMightContain("k", Seq(250L))
    files.size should be >= 1
    t.read().filter("k = 250").count() shouldBe 1L
    // appended wide rows get their own sidecars; lookup still works
    t.append(Seq((9000000000L, 1)).toDF("k", "g"))
    t.read().filter("k = 9000000000").count() shouldBe 1L
  }

  test("DML and compaction after widening materialize wide values") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 20).map(i => (i, i * 1.0f)).toDF("k", "x")
      .repartition(2))
    t.alterColumnType("x", DoubleType)
    // UPDATE arithmetic reads narrow pages through the wide schema
    t.update(Map("x" -> "x + 0.25"), "k <= 5") shouldBe 5L
    t.compact()
    val m = t.read().collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    m(3) shouldBe 3.25d
    m(10) shouldBe 10.0d
  }

  test("SQL: ALTER TABLE t ALTER COLUMN c TYPE BIGINT") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftSparkExtensions()(_))
      .getOrCreate()
    try {
      import s.implicits._
      val root = tmp() + "/t"
      val t = ManagedTable(s, root)
      t.overwriteAll(Seq((1, "a")).toDF("k", "v"))
      s.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN k TYPE BIGINT")
      t.manifest.get.schema("k").dataType shouldBe LongType
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
