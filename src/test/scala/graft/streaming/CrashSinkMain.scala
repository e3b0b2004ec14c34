package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Child-JVM streaming writer for [[CrashStreamSpec]]: generates numbered
  * single-row JSON input files (moved into the source dir atomically) and
  * streams them through the graft table SINK with a checkpoint, one file
  * per micro-batch, printing `XCRASH_COMMITTED <batch>` after each batch
  * lands — until the parent SIGKILLs it at an arbitrary point inside the
  * micro-batch commit (data write, record create, pointer swap, txn
  * marker, or the source's own offset/commit log writes).
  *
  * `mode=drain` re-runs the same query with `Trigger.AvailableNow` and no
  * generation: the checkpoint replays/continues and the run exits when
  * the backlog is drained — the recovery half of the fuzz.
  */
object CrashSinkMain {

  val Schema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("w", StringType)))

  /** Atomically land input file `i` (tmp write + rename into the watched
    * dir, so the file source never lists a torn file). */
  def writeInput(inDir: String, i: Long, writerId: String): Unit = {
    Files.createDirectories(Paths.get(inDir))
    val tmp = Paths.get(inDir, s".tmp-$i-$writerId")
    Files.write(tmp, s"""{"id":$i,"w":"$writerId"}\n""".getBytes("UTF-8"))
    Files.move(tmp, Paths.get(inDir, f"in-$i%06d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Highest landed input index (files are never deleted), -1 if none. */
  def maxInput(inDir: String): Long = {
    val d = new java.io.File(inDir)
    if (!d.exists()) -1L
    else d.listFiles().iterator
      .map(_.getName).filter(_.startsWith("in-"))
      .map(_.stripPrefix("in-").stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  def main(args: Array[String]): Unit = {
    graft.tables.ChildWatchdog.arm()
    val Array(root, writerId, _) = args
    val drain = writerId == "drain"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-crash-sink-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inDir = s"$root/in"

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) {
          println(s"XCRASH_COMMITTED ${e.progress.batchId}")
          System.out.flush()
        }
    })

    // the first run must find at least one file before the stream starts
    if (maxInput(inDir) < 0) writeInput(inDir, 0L, writerId)
    val q = spark.readStream.schema(Schema)
      // single-file micro-batches while being killed (the fuzz wants the
      // kill to land inside a per-batch commit); the DRAIN replays the
      // whole backlog and only checks exactly-once landing, so it batches
      // wide — with one sink commit per file, a few thousand leftover
      // inputs made the drain run MINUTES-long, and under co-hosted load
      // it overran the 15-min ChildWatchdog: the halt then read as "did
      // not finish cleanly" (the r16 red-suite flake)
      .option("maxFilesPerTrigger", if (drain) "100000" else "1")
      .json(inDir)
      .writeStream.format("graft")
      .option("path", s"$root/t")
      .option("checkpointLocation", s"$root/cp")
      .trigger(if (drain) Trigger.AvailableNow() else Trigger.ProcessingTime(0))
      .start()

    if (drain) {
      q.awaitTermination()
      println("XCRASH_DONE")
      spark.stop()
    } else {
      // feed numbered rows until the parent kills this process — BOUNDED.
      // The parent kills within (first commit + ≤250 ms), by when the
      // 1-file-per-trigger stream has consumed only a handful of inputs,
      // so a few hundred files keep the backlog alive through any kill
      // offset; unbounded 67-files/s generation during a slow first
      // commit (up to the parent's 180 s latch) piled up thousands of
      // single-batch replays for every later run of the same root.
      var i = maxInput(inDir) + 1
      val cap = i + 500L
      while (i < cap) {
        writeInput(inDir, i, writerId)
        i += 1
        Thread.sleep(15)
      }
      // backlog capped: stay alive awaiting the parent's SIGKILL (the
      // stream keeps committing the remaining files; the watchdog and
      // parent-death detector still bound this process's lifetime)
      while (true) Thread.sleep(1000)
    }
  }
}
