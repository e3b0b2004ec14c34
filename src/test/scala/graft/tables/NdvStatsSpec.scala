package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Per-file NDV sketches: `analyzeNdv` builds mergeable HLL sketches
  * incrementally (new files only), `ndvEstimates` unions them into
  * table-level distinct counts with zero data scan, and
  * `publishCatalogStats` feeds CBO. Small cardinalities stay in the
  * sketch's exact (coupon) regime, so these asserts are equalities. */
class NdvStatsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-ndv").toString

  test("estimates match count(DISTINCT) across types at small cardinality") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    val df = (1 to 1000).map { i =>
      (i % 37, i.toLong % 11, s"cat_${i % 23}", (i % 7) / 2.0,
        java.sql.Date.valueOf(f"2024-01-${i % 9 + 1}%02d"), i % 2 == 0)
    }.toDF("i", "l", "s", "d", "dt", "b").repartition(3)
    t.overwriteAll(df)
    t.analyzeNdv() shouldBe 3 // three files scanned
    val est = t.ndvEstimates()
    est("i") shouldBe 37L
    est("l") shouldBe 11L
    est("s") shouldBe 23L
    est("d") shouldBe 7L // (i%7)/2.0: seven distinct doubles 0.0 .. 3.0
    est("dt") shouldBe 9L
    est("b") shouldBe 2L
  }

  test("incremental: append re-analyzes only the new files") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 100).map(i => (i, i % 10)).toDF("k", "g")
      .repartition(2))
    t.analyzeNdv() shouldBe 2
    t.ndvEstimates()("k") shouldBe 100L
    // before re-analyze: the appended file has no sketch -> no estimate
    t.append((101 to 150).map(i => (i, i % 10)).toDF("k", "g").coalesce(1))
    t.ndvEstimates() shouldBe Map.empty
    t.approxCountDistinct("k") shouldBe None
    // re-analyze scans ONLY the appended file; union covers everything
    t.analyzeNdv() shouldBe 1
    t.ndvEstimates()("k") shouldBe 150L
    t.ndvEstimates()("g") shouldBe 10L
    // already complete: nothing to scan
    t.analyzeNdv() shouldBe 0
  }

  test("nulls are skipped; an all-null column estimates 0") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    val df = Seq((1, Some("a")), (2, Some("a")), (3, None), (4, None))
      .toDF("k", "v").withColumn("allnull", lit(null).cast("string"))
    t.overwriteAll(df.coalesce(1))
    t.analyzeNdv()
    val est = t.ndvEstimates()
    est("v") shouldBe 1L
    est("allnull") shouldBe 0L
  }

  test("partition columns answer exactly from the manifest") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 60).map(i => (i, s"p${i % 5}")).toDF("k", "p"),
      partitionBy = Seq("p"))
    // no analyze needed for the partition column
    t.approxCountDistinct("p") shouldBe Some(5L)
    // data column still needs sketches
    t.approxCountDistinct("k") shouldBe None
    t.analyzeNdv(Seq("k"))
    t.approxCountDistinct("k") shouldBe Some(60L)
  }

  test("rewrites invalidate coverage until re-analyzed; re-analyze is new-files-only") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 200).map(i => (i, i % 13)).toDF("k", "g")
      .repartition(4))
    t.analyzeNdv() shouldBe 4
    t.compact()
    t.ndvEstimates() shouldBe Map.empty // compacted files lack sketches
    val scanned = t.analyzeNdv()
    scanned should be >= 1
    scanned should be <= 2 // only the compacted output, never 4 again
    t.ndvEstimates()("k") shouldBe 200L
    t.ndvEstimates()("g") shouldBe 13L
  }

  test("unknown or unsupported columns are rejected") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1, Seq(1.0f, 2.0f))).toDF("k", "vec"))
    a[MetadataException] should be thrownBy t.analyzeNdv(Seq("nope"))
    a[MetadataException] should be thrownBy t.analyzeNdv(Seq("vec"))
    a[MetadataException] should be thrownBy t.ndvEstimates(Seq("nope"))
    // default set silently skips the unsupported array column
    t.analyzeNdv()
    t.ndvEstimates().keySet shouldBe Set("k")
  }

  test("graft.ndv.auto tops up the analyzed column set on append") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 100).map(i => (i, i % 9, s"x$i")).toDF("k", "g", "s")
      .repartition(2))
    // no store yet: auto stays a no-op even with the property on
    t.setTableProperties(Map("graft.ndv.auto" -> "true"))
    t.append((101 to 110).map(i => (i, i % 9, s"x$i")).toDF("k", "g", "s"))
    t.ndvEstimates() shouldBe Map.empty
    // explicit ANALYZE chooses the columns; appends then self-maintain
    t.analyzeNdv(Seq("k", "g"))
    t.append((111 to 160).map(i => (i, i % 9, s"x$i")).toDF("k", "g", "s")
      .coalesce(1))
    t.approxCountDistinct("k") shouldBe Some(160L)
    t.approxCountDistinct("g") shouldBe Some(9L)
    // the un-analyzed column stays un-analyzed (the store's set rules)
    t.approxCountDistinct("s") shouldBe None
  }

  test("SQL ANALYZE ... FOR COLUMNS + catalog stats under CBO") {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cbo.enabled", "true")
      .withExtensions(new graft.functions.GraftSparkExtensions()(_))
      .getOrCreate()
    try {
      import s.implicits._
      val t = ManagedTable.forLocation(s,
        graft.metadata.TableLocation("ndvdb.facts"))
      t.overwriteAll((1 to 500).map(i => (i, i % 21, s"n$i"))
        .toDF("k", "g", "name").repartition(2))
      s.sql("ANALYZE TABLE ndvdb.facts COMPUTE STATISTICS FOR ALL COLUMNS")
      t.ndvEstimates()("g") shouldBe 21L
      // catalog stats published: rowCount + per-column NDV/nullCount
      val cat = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("facts", Some("ndvdb")))
      val st = cat.stats.get
      st.rowCount shouldBe Some(BigInt(500))
      st.colStats("g").distinctCount shouldBe Some(BigInt(21))
      st.colStats("k").min shouldBe Some("1")
      st.colStats("k").max shouldBe Some("500")
      st.colStats("k").nullCount shouldBe Some(BigInt(0))
      // the optimizer now sees the real row count through spark.table
      val planned = s.table("ndvdb.facts").queryExecution.optimizedPlan
      planned.stats.rowCount shouldBe Some(BigInt(500))
      // FOR COLUMNS subset over the path form works too
      val root = tmp() + "/t2"
      val t2 = ManagedTable(s, root)
      t2.overwriteAll(Seq((1, "a"), (2, "b")).toDF("k", "v"))
      s.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS v")
      t2.approxCountDistinct("v") shouldBe Some(2L)
      t2.approxCountDistinct("k") shouldBe None // not in the subset
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
