package graft.plans

import graft.tables.ManagedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Metadata-only aggregate collapse ([[GraftMetadataAggRule]]): SQL
  * count/min/max over a graft table answers from the manifest with zero
  * scan; anything the stats cannot answer EXACTLY keeps the scan plan
  * and the scan's answer. */
class MetadataAggRuleSpec extends AnyFunSuite with Matchers {

  /** A session WITH the graft extensions (the suite may not be first in
    * the JVM, so the shared default session can't be assumed to carry
    * them — build a fresh one on the shared context). */
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

  private def stage(): String = {
    import spark.implicits._
    val db = s"magg${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE DATABASE $db")
    val path = java.nio.file.Files
      .createTempDirectory("graft-magg").toString + "/t"
    val t = ManagedTable(spark, path)
    t.overwriteAll((1L to 80L).map(i => (i, i * 1.5, s"s$i")).toDF("k", "v", "s")
      .repartition(3))
    t.append((81L to 100L).map(i => (i, i * 1.5, s"s$i")).toDF("k", "v", "s"))
    spark.sql(s"CREATE TABLE $db.t USING graft LOCATION '$path'")
    s"$db.t"
  }

  private def collapsed(sql: String): Boolean =
    spark.sql(sql).queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => true
    }.getOrElse(false)

  test("whole-table count/min/max collapses to a LocalRelation, exact values") {
    val name = stage()
    val q = s"SELECT count(*) AS c, min(k) AS mn, max(v) AS mx FROM $name"
    collapsed(q) shouldBe true
    val r = spark.sql(q).collect()(0)
    r.getLong(0) shouldBe 100L
    r.getLong(1) shouldBe 1L
    r.getDouble(2) shouldBe 150.0
  }

  test("count(col) collapses via per-file null counts, strings included") {
    import spark.implicits._
    val db = s"maggn${System.nanoTime() % 1000000}"
    spark.sql(s"CREATE DATABASE $db")
    val path = java.nio.file.Files
      .createTempDirectory("graft-maggn").toString + "/t"
    val t = ManagedTable(spark, path)
    t.overwriteAll(Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, null), (3L, "c"), (null, "d"))
      .toDF("k", "s").coalesce(1))
    spark.sql(s"CREATE TABLE $db.t USING graft LOCATION '$path'")
    val q = s"SELECT count(k) AS ck, count(s) AS cs, count(*) AS c FROM $db.t"
    collapsed(q) shouldBe true
    val r = spark.sql(q).collect()(0)
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 4L
  }

  test("filters, grouping, string min all keep the scan") {
    val name = stage()
    collapsed(s"SELECT count(*) FROM $name WHERE k > 10") shouldBe false
    collapsed(s"SELECT s, count(*) FROM $name GROUP BY s") shouldBe false
    collapsed(s"SELECT min(s) FROM $name") shouldBe false
    // and the unrewritten answers are still right
    spark.sql(s"SELECT count(*) FROM $name WHERE k > 10")
      .collect()(0).getLong(0) shouldBe 90L
  }

  test("a deletion vector disqualifies the collapse but not the answer") {
    val name = stage()
    spark.conf.set("spark.graft.dv.enabled", "true")
    try spark.sql(s"DELETE FROM $name WHERE k = 50")
    finally spark.conf.set("spark.graft.dv.enabled", "false")
    val q = s"SELECT count(*) AS c, min(k) AS mn FROM $name"
    collapsed(q) shouldBe false
    val r = spark.sql(q).collect()(0)
    r.getLong(0) shouldBe 99L
    r.getLong(1) shouldBe 1L
  }
}
