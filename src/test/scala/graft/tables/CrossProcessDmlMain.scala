package graft.tables

import org.apache.spark.sql.SparkSession

/** Child-JVM appender for [[CrossProcessDmlSpec]]: a SECOND process
  * committing one numeric-keyed append against a table root whose parent
  * process is mid-DML. Ids run `[idStart, idStart + n)`; a non-"-" `day`
  * adds the partition column. Prints `XPDML_COMMITTED <writer>` on
  * success — the parent asserts both the marker and the merged state. */
object CrossProcessDmlMain {
  def main(args: Array[String]): Unit = {
    graft.tables.ChildWatchdog.arm()
    val Array(root, writerId, idStart, n, day) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-xpdml-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      val t = ManagedTable(spark, root)
      val from = idStart.toLong
      val rows = (from until from + n.toInt)
      val df =
        if (day == "-") rows.map(i => (i, writerId)).toDF("id", "writer")
        else rows.map(i => (i, day.toInt, writerId)).toDF("id", "day", "writer")
      t.append(df.coalesce(1))
      println(s"XPDML_COMMITTED $writerId")
    } finally spark.stop()
  }
}
