package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.metadata.MetadataException

/** Identity columns (Delta `GENERATED ALWAYS AS IDENTITY`): engine-
  * assigned unique BIGINT values; the high watermark travels in the
  * manifest atomically with the rows it covers. */
class IdentityColumnsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-id").toString

  def fresh(path: String): ManagedTable = {
    import spark.implicits._
    val t = ManagedTable(spark, path)
    t.overwriteAll(Seq.empty[(String, Int)].toDF("name", "qty"))
    t.addIdentityColumn("id", start = 100L, step = 10L)
    t
  }

  def ids(t: ManagedTable): Seq[Long] =
    t.read().select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("appends assign unique, monotone, step-spaced values; watermark " +
      "advances across commits and reopened handles") {
    import spark.implicits._
    val path = tmp() + "/i1"
    val t = fresh(path)
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("name", "qty"))
    ids(t) shouldBe Seq(100L, 110L, 120L)
    t.append(Seq(("d", 4)).toDF("name", "qty"))
    ids(t) shouldBe Seq(100L, 110L, 120L, 130L)
    // a FRESH handle (new process) continues from the stored watermark
    val t2 = ManagedTable(spark, path)
    t2.append(Seq(("e", 5)).toDF("name", "qty"))
    ids(t2) shouldBe Seq(100L, 110L, 120L, 130L, 140L)
  }

  test("explicit non-null values are rejected; NULL means engine fills") {
    import spark.implicits._
    val t = fresh(tmp() + "/i2")
    intercept[ConstraintViolationException] {
      t.append(Seq(("a", 1)).toDF("name", "qty").withColumn("id", lit(7L)))
    }.getMessage should include("id")
    t.append(Seq(("a", 1)).toDF("name", "qty")
      .withColumn("id", lit(null).cast("bigint")))
    ids(t) shouldBe Seq(100L)
    intercept[MetadataException] {
      t.update(Map("id" -> "1"), "qty = 1")
    }.getMessage should include("GENERATED")
  }

  test("merge keeps existing ids on updates and allocates for inserts") {
    import spark.implicits._
    val t = fresh(tmp() + "/i3")
    t.append(Seq(("a", 1), ("b", 2)).toDF("name", "qty")) // ids 100, 110
    val src = Seq(("a", 10), ("z", 26)).toDF("name", "qty")
    MergeInto.byKey(t, src, "name")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val rows = t.read().select("name", "id", "qty").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    rows("a") shouldBe (100L, 10)   // updated row keeps its id
    rows("b") shouldBe (110L, 2)
    rows("z")._1 shouldBe 120L      // insert allocated past the watermark
    rows("z")._2 shouldBe 26
  }

  test("declaration rules: non-empty table rejected, BIGINT enforced, " +
      "rename carries watermark, drop removes it") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/i4")
    t.overwriteAll(Seq(("a", 1)).toDF("name", "qty"))
    intercept[MetadataException] {
      t.addIdentityColumn("id")
    }.getMessage should include("has data")
    val t2 = fresh(tmp() + "/i4b")
    t2.append(Seq(("a", 1)).toDF("name", "qty"))
    t2.renameColumn("id", "row_id")
    t2.identityColumnNames shouldBe Set("row_id")
    t2.append(Seq(("b", 2)).toDF("name", "qty"))
    t2.read().select("row_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(100L, 110L)
    t2.dropColumn("row_id")
    t2.identityColumnNames shouldBe empty
  }

  test("SQL: ADD COLUMN ... GENERATED ALWAYS AS IDENTITY (START WITH ...)") {
    val s2 = {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftSparkExtensions)
        .getOrCreate()
    }
    val db = s"idn${System.nanoTime() % 1000000}"
    s2.sql(s"CREATE DATABASE $db")
    val path = tmp() + "/i5"
    val t = ManagedTable(s2, path)
    import s2.implicits._
    t.overwriteAll(Seq.empty[(String, Int)].toDF("name", "qty"))
    s2.sql(s"CREATE TABLE $db.t USING graft LOCATION '$path'")
    s2.sql(s"ALTER TABLE $db.t ADD COLUMN id GENERATED ALWAYS AS IDENTITY " +
      "(START WITH 5 INCREMENT BY 5)")
    s2.sql(s"INSERT INTO $db.t (name, qty) VALUES ('a', 1), ('b', 2)")
    s2.table(s"$db.t").select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(5L, 10L)
  }
}
