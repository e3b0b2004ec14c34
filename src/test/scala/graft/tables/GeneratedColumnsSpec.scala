package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files
import java.sql.Timestamp

import graft.metadata.MetadataException
import graft.sources.GraftRelation

/** Generated columns (Delta `GENERATED ALWAYS AS` equivalent): rules are
  * manifest-versioned; writes compute/validate/recompute them; reads
  * INFER partition filters from base-column filters when the expression
  * has a recognized monotone shape. */
class GeneratedColumnsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-gen").toString

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** 6 rows across 3 days. */
  def events() = {
    import spark.implicits._
    Seq(
      (1, ts("2024-03-01 08:00:00"), "a"),
      (2, ts("2024-03-01 18:30:00"), "b"),
      (3, ts("2024-03-02 00:10:00"), "c"),
      (4, ts("2024-03-02 23:59:59"), "d"),
      (5, ts("2024-03-03 12:00:00"), "e"),
      (6, ts("2024-03-03 13:00:00"), "f")
    ).toDF("id", "event_ts", "payload")
  }

  test("declare on an empty table adopts the column; writes compute it") {
    val t = ManagedTable(spark, tmp() + "/g1")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    t.generatedColumns shouldBe Map("day" -> "CAST(event_ts AS DATE)")
    t.read().columns should contain("day")
    // writers never supply `day`; the engine computes it — partitioned
    t.overwriteAll(events(), partitionBy = Seq("day"))
    t.generatedColumns shouldBe Map("day" -> "CAST(event_ts AS DATE)") // survives overwrite
    t.read().count() shouldBe 6L
    t.read().filter("day = date'2024-03-02'").count() shouldBe 2L
    // the partition layout is real: 3 day-partitions
    t.manifest.get.files.map(_.partitionValues("day")).toSet should have size 3
  }

  test("append computes when absent, validates (and rejects) when wrong") {
    val t = ManagedTable(spark, tmp() + "/g2")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    t.overwriteAll(events(), partitionBy = Seq("day"))
    import spark.implicits._
    // absent → computed
    t.append(Seq((7, ts("2024-03-04 09:00:00"), "g"))
      .toDF("id", "event_ts", "payload"))
    t.read().filter("day = date'2024-03-04'").count() shouldBe 1L
    // supplied and matching → accepted
    t.append(Seq((8, ts("2024-03-04 10:00:00"), "h"))
      .toDF("id", "event_ts", "payload")
      .withColumn("day", to_date(lit("2024-03-04"))))
    // supplied and WRONG → rejected naming the column
    val e = intercept[ConstraintViolationException] {
      t.append(Seq((9, ts("2024-03-04 11:00:00"), "i"))
        .toDF("id", "event_ts", "payload")
        .withColumn("day", to_date(lit("1999-01-01"))))
    }
    e.getMessage should include("day")
    t.read().count() shouldBe 8L
  }

  test("UPDATE of a base column recomputes the generated column; " +
      "SET on the generated column itself is rejected") {
    val t = ManagedTable(spark, tmp() + "/g3")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    t.overwriteAll(events())
    t.update(Map("event_ts" -> "timestamp'2024-03-09 01:00:00'"), "id = 1")
    val r = t.read().filter("id = 1").head
    r.getAs[java.sql.Date]("day").toString shouldBe "2024-03-09"
    intercept[MetadataException] {
      t.update(Map("day" -> "date'1999-01-01'"), "id = 2")
    }.getMessage should include("GENERATED")
  }

  test("merge rewrite recomputes; rules survive merge and clone") {
    val t = ManagedTable(spark, tmp() + "/g4")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    t.overwriteAll(events())
    import spark.implicits._
    val src = Seq((1, ts("2024-03-07 05:00:00"), "a2"),
      (10, ts("2024-03-08 06:00:00"), "j"))
      .toDF("id", "event_ts", "payload")
    MergeInto.byKey(t, src, "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val rows = t.read().filter("id in (1, 10)")
      .select("id", "day").orderBy("id").collect()
    rows.map(_.get(1).toString).toSeq shouldBe Seq("2024-03-07", "2024-03-08")
    val clone = t.shallowCloneTo(tmp() + "/g4clone")
    clone.generatedColumns shouldBe t.generatedColumns
  }

  test("declaring on existing data validates; mismatch rejects; " +
      "existing-satisfying column accepted") {
    val t = ManagedTable(spark, tmp() + "/g5")
    t.overwriteAll(events().withColumn("day", to_date(col("event_ts"))))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)") // holds → ok
    t.generatedColumns.keySet shouldBe Set("day")
    val t2 = ManagedTable(spark, tmp() + "/g5b")
    t2.overwriteAll(events().withColumn("day", to_date(lit("1999-01-01"))))
    intercept[ConstraintViolationException] {
      t2.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    }
    // absent column on a NON-empty table → must materialize first
    val t3 = ManagedTable(spark, tmp() + "/g5c")
    t3.overwriteAll(events())
    intercept[MetadataException] {
      t3.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    }.getMessage should include("materialize")
  }

  test("DDL interplay: drop target drops rule; referenced base protected; " +
      "rename target carries the rule") {
    val t = ManagedTable(spark, tmp() + "/g6")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    intercept[MetadataException] {
      t.dropColumn("event_ts") // referenced by the rule
    }.getMessage should include("generated")
    t.renameColumn("day", "event_day")
    t.generatedColumns.keySet shouldBe Set("event_day")
    t.dropColumn("event_day")
    t.generatedColumns shouldBe empty
  }

  test("partition-filter inference: a timestamp range filter prunes " +
      "generated day partitions") {
    val t = ManagedTable(spark, tmp() + "/g7")
    t.overwriteAll(events().limit(0))
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)")
    t.overwriteAll(events(), partitionBy = Seq("day"))
    val m = t.manifest.get
    val rel = GraftRelation(spark.sqlContext, t.rootPath, None)
    import org.apache.spark.sql.sources._
    // equality on the BASE column → exactly the one day-partition's files
    val eq = rel.prunedFiles(m,
      Array(EqualTo("event_ts", ts("2024-03-02 00:10:00"))))
    eq.map(_.partitionValues("day")).toSet shouldBe Set("2024-03-02")
    // range on the base column → only the covered days
    val range = rel.prunedFiles(m, Array(
      GreaterThanOrEqual("event_ts", ts("2024-03-02 00:00:00")),
      LessThan("event_ts", ts("2024-03-03 00:00:00"))))
    range.map(_.partitionValues("day")).toSet shouldBe
      Set("2024-03-02", "2024-03-03")
    // end-to-end through format("graft"): same rows as an unpruned read
    val viaFmt = spark.read.format("graft").load(t.rootPath)
      .filter(col("event_ts") >= lit(ts("2024-03-02 00:00:00")) &&
        col("event_ts") < lit(ts("2024-03-03 00:00:00")))
    viaFmt.select("id").collect().map(_.getInt(0)).sorted shouldBe Array(3, 4)
  }

  test("non-monotone / multi-column expressions infer nothing (conservative)") {
    val m = GeneratedColumns.monotonicEval(spark, "month(event_ts)",
      events().schema)
    m shouldBe None
    val two = GeneratedColumns.monotonicEval(spark,
      "concat(payload, cast(id as string))", events().schema)
    two shouldBe None
    // and the recognized shapes resolve
    GeneratedColumns.monotonicEval(spark, "CAST(event_ts AS DATE)",
      events().schema).map(_._1) shouldBe Some("event_ts")
    GeneratedColumns.monotonicEval(spark, "year(event_ts)",
      events().schema).map(_._1) shouldBe Some("event_ts")
    GeneratedColumns.monotonicEval(spark, "id div 100",
      events().schema).map(_._1) shouldBe Some("id")
    GeneratedColumns.monotonicEval(spark, "substring(payload, 1, 2)",
      events().schema).map(_._1) shouldBe Some("payload")
    GeneratedColumns.monotonicEval(spark, "date_trunc('month', event_ts)",
      events().schema).map(_._1) shouldBe Some("event_ts")
  }

  test("rules travel through time travel and survive restore") {
    val t = ManagedTable(spark, tmp() + "/g8")
    t.overwriteAll(events().limit(0))            // v0: no rules
    t.addGeneratedColumn("day", "CAST(event_ts AS DATE)") // v1
    t.overwriteAll(events())                      // v2
    t.readManifest(0).generated shouldBe empty
    t.readManifest(2).generated.keySet shouldBe Set("day")
    t.restore(0)
    // restore keeps table-level governance (like constraints): rules carry
    t.generatedColumns.keySet shouldBe Set("day")
  }
}
