package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Metadata-only aggregation ([[ManagedTable.statsAggregate]] /
  * [[ManagedTable.minMaxCount]]): exact count + min/max from per-file
  * footer stats, with conservative None on every ambiguity. */
class StatsAggregateSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-statsagg").toString

  test("multi-commit table: exact count/min/max, matches a real scan") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((5L, 2.5, "x"), (3L, -1.0, "y"), (9L, 0.0, "z"))
      .toDF("k", "v", "s").repartition(2))
    t.append(Seq((1L, 7.25, "w"), (12L, -3.5, "q")).toDF("k", "v", "s"))

    val r = t.statsAggregate(Seq("k", "v")).get.collect()(0)
    r.getLong(0) shouldBe 5L
    r.getLong(1) shouldBe 1L   // min_k
    r.getLong(2) shouldBe 12L  // max_k
    r.getDouble(3) shouldBe -3.5
    r.getDouble(4) shouldBe 7.25

    // identical to the scan-computed answer, column for column
    val scan = t.read().agg(count(lit(1)).as("cnt"),
      min("k"), max("k"), min("v"), max("v")).collect()(0)
    (0 until 5).foreach(i => r.get(i) shouldBe scan.get(i))
  }

  test("timestamp and date columns reconstruct typed extrema") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (TIMESTAMP_NTZ '2024-01-10 10:00:00', DATE '2020-03-01'),
        |  (TIMESTAMP_NTZ '2023-06-01 00:00:01', DATE '2027-12-31'),
        |  (TIMESTAMP_NTZ '2025-02-28 23:59:59', DATE '1999-01-01')
        |AS t(ts, d)""".stripMargin)
    val t = ManagedTable(spark, tmp() + "/ts")
    t.overwriteAll(df)
    val r = t.statsAggregate(Seq("ts", "d")).get.collect()(0)
    r.getAs[java.time.LocalDateTime](1).toString shouldBe "2023-06-01T00:00:01"
    r.getAs[java.time.LocalDateTime](2).toString shouldBe "2025-02-28T23:59:59"
    r.getAs[java.sql.Date](3).toString shouldBe "1999-01-01"
    r.getAs[java.sql.Date](4).toString shouldBe "2027-12-31"
  }

  test("nulls are ignored like SQL min/max; all-null files resolve via null counts") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/n")
    // one file mixes nulls and values -> footer stats ignore the nulls
    t.overwriteAll(Seq[(java.lang.Long, java.lang.Long)](
      (1L, null), (2L, 44L), (3L, 11L)).toDF("k", "v").coalesce(1))
    val r = t.statsAggregate(Seq("v")).get.collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 11L
    r.getLong(2) shouldBe 44L
    // an ALL-null file has no footer min/max for v, but its recorded
    // null count proves it contributes no extremum — still exact
    t.append(Seq[(java.lang.Long, java.lang.Long)]((4L, null), (5L, null))
      .toDF("k", "v").coalesce(1))
    val r2 = t.statsAggregate(Seq("v")).get.collect()(0)
    r2.getLong(0) shouldBe 5L
    r2.getLong(1) shouldBe 11L
    r2.getLong(2) shouldBe 44L
    val f = t.minMaxCount(Seq("v")).collect()(0)
    f.getLong(0) shouldBe 5L
    f.getLong(1) shouldBe 11L
    f.getLong(2) shouldBe 44L
    // exact non-null counts ride the same stats
    t.statsAggregateRaw(Seq("v")).get._2.head.nonNulls shouldBe Some(2L)
    t.statsAggregateRaw(Seq("k")).get._2.head.nonNulls shouldBe Some(5L)
  }

  test("files imported without footer reads stay ambiguous and disqualify") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val root = tmp() + "/imp"
    val t0 = ManagedTable(spark, root + "/src")
    t0.overwriteAll(Seq((1L, 10L), (2L, 20L)).toDF("k", "v").coalesce(1))
    val dataRel = t0.manifest.get.files.head.path
    // adopt the raw file into a fresh table WITHOUT stats or null counts
    val t = ManagedTable(spark, root + "/src") // same table, new entry path
    val imp = ManagedTable(spark, root + "/dst")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root + "/dst"))
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(root + "/src/" + dataRel),
      fs, new org.apache.hadoop.fs.Path(root + "/dst/adopted.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    imp.importFiles(
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))),
      Nil, Seq(TableFile("adopted.parquet", Map.empty, rows = Some(2L))))
    // rows known but no stats / null counts -> min/max must abstain,
    // and neither extrema nor non-null counts claim exactness
    imp.statsAggregate(Seq("v")) shouldBe None
    val raw = imp.statsAggregateRaw(Seq("v")).get._2.head
    raw.extremaExact shouldBe false
    raw.nonNulls shouldBe None
  }

  test("deletion vectors disqualify; string and unknown columns disqualify") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/dv")
    t.overwriteAll((1L to 100L).map(i => (i, s"s$i")).toDF("k", "s"))
    t.statsAggregate(Seq("s")) shouldBe None  // string: never metadata-exact
    t.statsAggregate(Seq("nope")) shouldBe None
    spark.conf.set("spark.graft.dv.enabled", "true")
    try t.delete("k = 50") finally
      spark.conf.set("spark.graft.dv.enabled", "false")
    t.manifest.get.files.exists(_.dv.nonEmpty) shouldBe true
    t.statsAggregate(Seq("k")) shouldBe None  // a masked row might be an extremum
    val f = t.minMaxCount(Seq("k")).collect()(0)
    f.getLong(0) shouldBe 99L
    f.getLong(1) shouldBe 1L
    f.getLong(2) shouldBe 100L
  }

  test("empty table: cnt 0 with typed nulls; renamed column answers by logical name") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/e")
    t.overwriteAll(Seq((1L, 2.0)).toDF("k", "v").limit(0))
    val r = t.statsAggregate(Seq("k", "v")).get.collect()(0)
    r.getLong(0) shouldBe 0L
    r.isNullAt(1) shouldBe true
    r.isNullAt(4) shouldBe true

    // column mapping: stats live under the PHYSICAL name, the logical
    // name must still resolve after a rename
    val t2 = ManagedTable(spark, tmp() + "/cm")
    t2.overwriteAll(Seq((1L, 5L), (2L, 9L)).toDF("k", "v"))
    t2.renameColumn("v", "value")
    val r2 = t2.statsAggregate(Seq("value")).get.collect()(0)
    r2.getLong(1) shouldBe 5L
    r2.getLong(2) shouldBe 9L
    r2.schema.fieldNames should contain allOf ("min_value", "max_value")
  }
}
