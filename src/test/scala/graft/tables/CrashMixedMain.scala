package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM mixed-operation writer for [[CrashRecoverySpec]]: cycles
  * appends, predicate DELETEs, and small-file compactions so a SIGKILL
  * can land inside any of the commit flows (plain add, add+remove
  * rewrite, content-preserving maintenance). Prints `XCRASH_COMMITTED
  * <i>` after each op. */
object CrashMixedMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crashmix-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = ManagedTable(spark, root)
    (1 to n.toInt).foreach { i =>
      (i % 5) match {
        case 3 => t.delete(s"bucket = ${i % 7}")
        case 4 => t.compactSmall(smallBytes = 1L << 20)
        case _ =>
          t.append(Seq((s"$writerId-$i", i % 7, writerId))
            .toDF("id", "bucket", "w").coalesce(1))
      }
      println(s"XCRASH_COMMITTED $i")
      System.out.flush()
    }
    println("XCRASH_DONE")
    spark.stop()
  }
}
