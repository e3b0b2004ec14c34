package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM continuous appender for [[CrashRecoverySpec]]: commits
  * single-row appends in a tight loop, printing `XCRASH_COMMITTED <i>`
  * after each, until the parent SIGKILLs it at an arbitrary point in
  * the commit protocol. */
object CrashWriterMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crash-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = ManagedTable(spark, root)
    (1 to n.toInt).foreach { i =>
      t.append(Seq((s"$writerId-$i", writerId)).toDF("id", "w").coalesce(1))
      println(s"XCRASH_COMMITTED $i")
      System.out.flush()
    }
    println("XCRASH_DONE")
    spark.stop()
  }
}
