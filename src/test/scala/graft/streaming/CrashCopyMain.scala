package graft.streaming

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Child-JVM COPY INTO loop for [[CrashStreamSpec]]: lands one new
  * single-row parquet file per iteration (staged then moved into the
  * landing dir atomically), runs [[graft.tables.CopyInto]] over the
  * SHARED landing dir — the per-directory incremental ledger — and
  * prints `XCRASH_COMMITTED <i>`, until the parent SIGKILLs it inside
  * the load's ledger+commit window (between "rows appended" and "files
  * marked seen", the subtlest consumer of the commit protocol). */
object CrashCopyMain {

  /** Highest landed file index, -1 if none. */
  def maxLanded(landing: String): Long =
    Option(new java.io.File(landing).listFiles())
      .map(_.iterator.map(_.getName)
        .filter(n => n.startsWith("f") && n.endsWith(".parquet"))
        .map(_.stripPrefix("f").stripSuffix(".parquet").toLong)
        .foldLeft(-1L)(math.max))
      .getOrElse(-1L)

  def main(args: Array[String]): Unit = {
    graft.tables.ChildWatchdog.arm()
    val Array(root, writerId, n) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crash-copy-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val landing = s"$root/landing"
    Files.createDirectories(Paths.get(landing))
    // continue numbering after what previous (killed) incarnations landed
    val start = maxLanded(landing) + 1
    (start until start + n.toLong).foreach { i =>
      val stage = s"$root/stage/$i"
      Seq((i, writerId)).toDF("id", "w").coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(landing, s"f$i.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      graft.tables.CopyInto(spark, s"$root/t", landing)
      println(s"XCRASH_COMMITTED $i")
      System.out.flush()
    }
    println("XCRASH_DONE")
    spark.stop()
  }
}
