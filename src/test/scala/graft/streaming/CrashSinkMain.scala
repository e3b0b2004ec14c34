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
      .option("maxFilesPerTrigger", "1")
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
      // keep feeding numbered rows until the parent kills this process
      var i = maxInput(inDir) + 1
      while (true) {
        writeInput(inDir, i, writerId)
        i += 1
        Thread.sleep(15)
      }
    }
  }
}
