package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM writer for [[CrossProcessWriterSpec]]: a SECOND process
  * committing appends against a table root the parent test is writing
  * too. Prints `XPW_COMMITTED <writer> <n>` on success — the parent
  * asserts both the marker and the merged table state. */
object CrossProcessWriterMain {
  def main(args: Array[String]): Unit = {
    ChildWatchdog.arm()
    val Array(root, writerId, nCommits, rowsPerCommit) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-xpw-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val t = ManagedTable(spark, root)
      var done = 0
      (1 to nCommits.toInt).foreach { i =>
        val rows = (1 to rowsPerCommit.toInt)
          .map(r => (s"$writerId-$i-$r", writerId))
        t.append(rows.toDF("id", "writer"))
        done += 1
      }
      // stdout marker parsed by the parent test
      println(s"XPW_COMMITTED $writerId $done")
    } finally spark.stop()
  }
}
