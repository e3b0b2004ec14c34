package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Idempotent incremental bulk loading ([[CopyInto]], `COPY INTO` SQL):
  * each invocation loads only files a previous one has not. */
class CopyIntoSpec extends AnyFunSuite with Matchers {

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

  def tmp(): String = Files.createTempDirectory("graft-copy").toString

  test("copy into loads new files only, exactly once across reruns") {
    import spark.implicits._
    val src = tmp() + "/src"
    val tableRoot = tmp() + "/t"
    Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src)
    // first load creates the table
    CopyInto(spark, tableRoot, src) shouldBe 2L
    val t = ManagedTable(spark, tableRoot)
    t.read().count() shouldBe 2
    // rerun with nothing new: zero rows, no duplicate
    CopyInto(spark, tableRoot, src) shouldBe 0L
    t.read().count() shouldBe 2
    // a new file arrives — only it loads
    Seq((3, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src)
    CopyInto(spark, tableRoot, src) shouldBe 1L
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
  }

  test("COPY INTO SQL over a path escape returns the inserted-row count") {
    import spark.implicits._
    val src = tmp() + "/src2"
    val tableRoot = tmp() + "/t2"
    Seq((10, "x"), (11, "y"), (12, "z")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(src)
    val out = spark.sql(
      s"COPY INTO graft.`$tableRoot` FROM '$src' FILEFORMAT = PARQUET")
    out.head.getLong(0) shouldBe 3L
    spark.sql(s"SELECT count(*) FROM graft.`$tableRoot`")
      .head.getLong(0) shouldBe 3L
    // idempotent through SQL too
    spark.sql(s"COPY INTO graft.`$tableRoot` FROM '$src'")
      .head.getLong(0) shouldBe 0L
  }
}
