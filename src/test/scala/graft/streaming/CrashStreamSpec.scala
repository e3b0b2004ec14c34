package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.io.{BufferedReader, InputStreamReader}
import java.nio.file.Files

import graft.tables.ManagedTable

/** Crash-point fuzz of the STREAMING consumers of the commit protocol —
  * the txn-embedded exactly-once paths a SIGKILL can land inside at any
  * offset:
  *
  *  - the table stream SINK's micro-batch commit
  *    ([[TableStreamSink.addBatch]]: data write → record create →
  *    pointer swap → txn marker, racing the engine's own offset/commit
  *    logs);
  *  - `COPY INTO`'s ledger+commit window (rows appended vs files marked
  *    seen).
  *
  * Invariant after every kill AND after recovery: each input row appears
  * in the table EXACTLY once — a kill may lose the not-yet-committed
  * tail (redelivered on restart), but never duplicates a committed batch
  * and never loses one. */
class CrashStreamSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val allArbiters = Seq("rename", "posix", "condput")

  /** Parent-side arbiter selection; zero grace lets recovery drop a
    * condput kill's torn record immediately (see CrashRecoverySpec). */
  private def withArbiter[A](arbiter: String)(f: => A): A = {
    spark.conf.set("spark.graft.commit.arbiter", arbiter)
    spark.conf.set("spark.graft.commit.tornRecordGraceMs", "0")
    try f finally {
      spark.conf.unset("spark.graft.commit.arbiter")
      spark.conf.unset("spark.graft.commit.tornRecordGraceMs")
    }
  }

  private def fork(main: String, root: String, writer: String,
      n: String, arbiter: String): Process = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      s"-Dspark.graft.commit.arbiter=$arbiter",
      "-Dspark.graft.commit.tornRecordGraceMs=0",
      "-cp", System.getProperty("java.class.path"),
      main, root, writer, n)
    new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
  }

  /** Fork `main`, latch on its first `XCRASH_COMMITTED`, sleep `delay`,
    * SIGKILL. Returns after the child is dead. */
  private def killAfterFirstCommit(main: String, root: String,
      writer: String, delay: Long, arbiter: String,
      n: String = "100000"): Unit = {
    val child = fork(main, root, writer, n, arbiter)
    val out = new BufferedReader(new InputStreamReader(child.getInputStream))
    val sawCommit = new java.util.concurrent.CountDownLatch(1)
    val drain = new Thread(() => {
      var line = out.readLine()
      while (line != null) {
        if (line.startsWith("XCRASH_COMMITTED")) sawCommit.countDown()
        line = try out.readLine() catch { case _: Exception => null }
      }
    })
    drain.setDaemon(true)
    drain.start()
    // destroy in finally: a latch-timeout assertion thrown HERE used to
    // skip the kill and orphan a child mid-fuzz — two such orphans were
    // found burning ~3 cores each for hours, inflating every co-hosted
    // benchmark (the child now also carries ChildWatchdog as its own
    // backstop)
    try {
      withClue(s"$main $writer never committed\n") {
        sawCommit.await(180, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      }
      Thread.sleep(delay)
    } finally {
      child.destroyForcibly()
      child.waitFor()
    }
  }

  /** Run `main` to voluntary completion (`XCRASH_DONE`). */
  private def runToDone(main: String, root: String, writer: String,
      n: String, arbiter: String): Unit = {
    val child = fork(main, root, writer, n, arbiter)
    val out = new BufferedReader(new InputStreamReader(child.getInputStream))
    var done = false
    var line = out.readLine()
    while (line != null) {
      if (line.startsWith("XCRASH_DONE")) done = true
      line = out.readLine()
    }
    child.waitFor()
    withClue(s"$main $writer did not finish cleanly\n") { done shouldBe true }
  }

  private def idCounts(root: String): Map[Long, Long] = {
    val t = ManagedTable(spark, s"$root/t")
    if (!t.exists) Map.empty
    else t.read().groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def sinkFuzz(arbiter: String): Unit = {
    val root = Files.createTempDirectory(s"graft-crashsink-$arbiter")
      .toString
    // three kill rounds at varied offsets land inside different phases
    // of the micro-batch commit; each restart recovers from the same
    // checkpoint and must suppress any replayed batch
    Seq(0L, 80L, 250L).zipWithIndex.foreach { case (delay, it) =>
      killAfterFirstCommit("graft.streaming.CrashSinkMain", root,
        s"s$it", delay, arbiter)
      val counts = idCounts(root)
      withClue(s"iteration $it (delay ${delay}ms): dup ids " +
          s"${counts.filter(_._2 > 1)}\n") {
        // the exactly-once half checkable mid-stream: no id twice
        counts.valuesIterator.forall(_ == 1L) shouldBe true
      }
    }
    // recovery half: a clean AvailableNow run drains the backlog; the
    // table must then hold EVERY landed input id exactly once
    runToDone("graft.streaming.CrashSinkMain", root, "drain", "0", arbiter)
    val landed = (0L to CrashSinkMain.maxInput(s"$root/in")).toSet
    val counts = idCounts(root)
    counts.keySet shouldBe landed
    all(counts.values) shouldBe 1L
  }

  private def copyFuzz(arbiter: String): Unit = {
    val root = Files.createTempDirectory(s"graft-crashcopy-$arbiter")
      .toString
    Seq(0L, 60L, 200L).zipWithIndex.foreach { case (delay, it) =>
      killAfterFirstCommit("graft.streaming.CrashCopyMain", root,
        s"c$it", delay, arbiter, n = "100000")
      val counts = idCounts(root)
      withClue(s"iteration $it (delay ${delay}ms): dup ids " +
          s"${counts.filter(_._2 > 1)}\n") {
        counts.valuesIterator.forall(_ == 1L) shouldBe true
      }
    }
    // the parent's own COPY INTO finishes whatever a kill left half-done
    graft.tables.CopyInto(spark, s"$root/t", s"$root/landing")
    val landed = (0L to CrashCopyMain.maxLanded(s"$root/landing")).toSet
    val counts = idCounts(root)
    counts.keySet shouldBe landed
    all(counts.values) shouldBe 1L
  }

  allArbiters.foreach { arb =>
    test(s"[$arb] SIGKILL inside the stream sink's micro-batch commit: " +
        "no committed batch duplicates or vanishes across restarts; " +
        "drain lands every file exactly once") {
      withArbiter(arb)(sinkFuzz(arb))
    }

    test(s"[$arb] SIGKILL inside COPY INTO's ledger+commit window: a " +
        "re-run loads each landed file exactly once, never double, " +
        "never drops") {
      withArbiter(arb)(copyFuzz(arb))
    }
  }
}
