package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM matview maintainer for [[CrashRecoverySpec]]: each iteration
  * appends a fresh id range to the base table and refreshes the
  * incremental view — two commits whose consistency contract (the view's
  * sync anchor rides the refresh commit as a writer txn) the parent
  * SIGKILLs into at arbitrary offsets. Prints `XCRASH_COMMITTED <i>`
  * after each full append+refresh iteration. */
object CrashMatviewMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, idOffset, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-crash-mv")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = ManagedTable(spark, s"$root/src")
    val mv = MaterializedAgg(spark, src, s"$root/view", "id",
      Seq("grp"), Seq("qty"))
    val off = idOffset.toLong
    (1 to n.toInt).foreach { i =>
      val lo = off + (i - 1) * 20L
      val rows = (lo until lo + 20L)
        .map(id => (id, id % 3, id % 7)).toDF("id", "grp", "qty")
      src.append(rows.coalesce(1))
      mv.refresh()
      println(s"XCRASH_COMMITTED $i")
      System.out.flush()
    }
    println("XCRASH_DONE")
    spark.stop()
  }
}
