package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM vacuum runner for [[CrashRecoverySpec]]: prints the marker
  * BEFORE calling vacuum so the parent can SIGKILL it mid-delete (the
  * horizon is published first; the delete fan-out is the crash
  * window under test). */
object CrashVacuumMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, writerId, _) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crashvac-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = ManagedTable(spark, root)
    println("XCRASH_COMMITTED 0") // parent kills some ms after this
    System.out.flush()
    t.vacuum(retainVersions = 2)
    println("XCRASH_DONE")
    spark.stop()
  }
}
