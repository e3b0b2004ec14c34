package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Mirrors the driver's t1 smoke: entry() on sf0.001 returns rows. */
class EntrySmokeSpec extends AnyFunSuite with Matchers {
  test("entry returns rows at sf0.001") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.entry(spark).count() should be > 0L
  }
}
