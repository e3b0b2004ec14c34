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

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
    .getOrCreate()

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

  test("filters, grouping, string min, count(col) all keep the scan") {
    val name = stage()
    collapsed(s"SELECT count(*) FROM $name WHERE k > 10") shouldBe false
    collapsed(s"SELECT s, count(*) FROM $name GROUP BY s") shouldBe false
    collapsed(s"SELECT min(s) FROM $name") shouldBe false
    collapsed(s"SELECT count(s) FROM $name") shouldBe false
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
