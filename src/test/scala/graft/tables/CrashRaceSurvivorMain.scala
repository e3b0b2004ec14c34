package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM survivor for [[CrashRecoverySpec]]'s racing fuzz: a BOUNDED
  * single-row appender sharing [[CrashWriterMain]]'s (id, w) schema. It
  * races the killable writer on the same root and must land every one of
  * its commits — its optimistic-retry loop digesting whatever orphaned or
  * torn record the corpse leaves behind. Prints `XRACE_DONE <writer> <n>`
  * only after ALL commits landed; the parent asserts the marker and a
  * clean exit. */
object CrashRaceSurvivorMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-race-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val t = ManagedTable(spark, root)
      (1 to n.toInt).foreach { i =>
        t.append(Seq((s"$writerId-$i", writerId)).toDF("id", "w").coalesce(1))
      }
      println(s"XRACE_DONE $writerId $n")
      System.out.flush()
    } finally spark.stop()
  }
}
