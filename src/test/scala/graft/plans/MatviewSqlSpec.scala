package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.tables.ManagedTable

/** `CREATE MATERIALIZED VIEW` / `REFRESH MATERIALIZED VIEW` through the
  * sub-grammar parser: restricted-shape validation, path and catalog
  * targets, and incremental refresh driven purely by the view's
  * self-description. */
class MatviewSqlSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftSparkExtensions)
      .getOrCreate()
  }

  private def freshSource(): String = {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-mvsql")
      .toString + "/src"
    val t = ManagedTable(spark, path)
    t.overwriteAll((0 until 40)
      .map(i => (i.toLong, (i % 3).toLong, (i % 7).toLong))
      .toDF("id", "grp", "qty"))
    t.setTableProperties(Map("graft.cdc.keys" -> "id"))
    path
  }

  test("create over a path, refresh folds in changes") {
    val src = freshSource()
    val view = src.stripSuffix("/src") + "/view"
    val out = spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, COUNT(*), SUM(qty) FROM graft.`$src`
         |GROUP BY grp""".stripMargin).collect()
    out.head.getString(0) shouldBe view
    val v = ManagedTable(spark, view)
    val want0 = ManagedTable(spark, src).read()
      .groupBy("grp").count().orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    v.read().select("grp", "cnt").orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe want0
    // change the source, refresh by name — only the view's own
    // self-description drives the fold
    val s = ManagedTable(spark, src)
    s.delete("id % 5 = 0")
    s.update(Map("qty" -> "qty + 100"), "id % 11 = 3")
    val synced = spark.sql(
      s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
    synced.head.getLong(0) shouldBe s.currentVersion.get
    val want = s.read().groupBy("grp")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.sum(col("qty")).as("sum_qty"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    v.read().select("grp", "cnt", "sum_qty").orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq shouldBe want
  }

  test("catalog-name target registers the view for spark.table") {
    val src = freshSource()
    val db = s"mv${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE DATABASE $db")
    spark.sql(
      s"""CREATE MATERIALIZED VIEW $db.v AS
         |SELECT grp, COUNT(*) FROM graft.`$src` GROUP BY grp""".stripMargin)
    spark.table(s"$db.v").count() shouldBe 3
    spark.sql(s"REFRESH MATERIALIZED VIEW $db.v").collect()
      .head.getLong(0) shouldBe // nothing changed — stays at source head
      ManagedTable(spark, src).currentVersion.get
  }

  test("shape validation: missing COUNT(*), stray columns, bad alias") {
    val src = freshSource()
    val view = src.stripSuffix("/src") + "/v2"
    val ex1 = intercept[graft.metadata.MetadataException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, SUM(qty) FROM graft.`$src` GROUP BY grp""".stripMargin))
    ex1.getMessage should include("COUNT(*)")
    val ex2 = intercept[graft.metadata.MetadataException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, id, COUNT(*) FROM graft.`$src` GROUP BY grp""".stripMargin))
    ex2.getMessage should include("GROUP BY")
    val ex3 = intercept[graft.metadata.MetadataException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, COUNT(*) AS n FROM graft.`$src` GROUP BY grp""".stripMargin))
    ex3.getMessage should include("cnt")
  }

  test("MIN/MAX items create an extremum-maintained view") {
    val src = freshSource()
    val view = src.stripSuffix("/src") + "/vmm"
    spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`$view` AS
         |SELECT grp, COUNT(*), MIN(qty), MAX(qty) FROM graft.`$src`
         |GROUP BY grp""".stripMargin)
    val s = ManagedTable(spark, src)
    // kill every group's maximum: only a touched-group recompute recovers
    s.delete("qty = 6")
    spark.sql(s"REFRESH MATERIALIZED VIEW graft.`$view`").collect()
    val want = s.read().groupBy("grp")
      .agg(org.apache.spark.sql.functions.min(col("qty")).as("mn"),
        org.apache.spark.sql.functions.max(col("qty")).as("mx"))
      .orderBy("grp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    ManagedTable(spark, view).read()
      .select("grp", "min_qty", "max_qty").orderBy("grp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq shouldBe want
    // alias must match the canonical name
    val ex = intercept[graft.metadata.MetadataException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`${view}2` AS
         |SELECT grp, COUNT(*), MIN(qty) AS lo FROM graft.`$src`
         |GROUP BY grp""".stripMargin))
    ex.getMessage should include("min_qty")
  }

  test("source without declared row identity refuses with guidance") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-mvsql")
      .toString + "/nokeys"
    ManagedTable(spark, path)
      .overwriteAll(Seq((1L, 2L)).toDF("id", "grp"))
    val ex = intercept[graft.metadata.MetadataException](spark.sql(
      s"""CREATE MATERIALIZED VIEW graft.`${path}_v` AS
         |SELECT grp, COUNT(*) FROM graft.`$path` GROUP BY grp""".stripMargin))
    ex.getMessage should include("graft.cdc.keys")
  }
}
