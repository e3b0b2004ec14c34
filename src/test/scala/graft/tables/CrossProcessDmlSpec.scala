package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** TWO-PROCESS predicate-aware DML conflict resolution:
  * [[ConcurrentDmlSpec]] proves the rebase rule with an in-JVM rival,
  * where the loser re-reads a manifest its own process just wrote. Here
  * the rival is a forked child JVM ([[CrossProcessDmlMain]]) whose commit
  * the parent has never seen — the rebase must reconstruct the winner's
  * head from disk (no shared caches), price the winner's added files from
  * the manifest it just read, and recommit metadata-only on top. This is
  * the actual multi-driver deployment story: `DELETE WHERE id < retention`
  * surviving a live ingest process landing mid-transaction. */
class CrossProcessDmlSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-xpdml").toString

  private def ids(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map(i => (i.toLong, "seed")).toDF("id", "writer")
  }

  private def dayRows(from: Int, until: Int, day: Int) = {
    import spark.implicits._
    (from until until).map(i => (i.toLong, day, "seed"))
      .toDF("id", "day", "writer")
  }

  /** Fork the child appender, block until it exits, and fail loudly on a
    * non-zero exit or missing success marker. */
  private def forkAppend(root: String, writer: String, idStart: Long,
      n: Int, day: Option[Int]): Unit = {
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
      "-cp", System.getProperty("java.class.path"),
      "graft.tables.CrossProcessDmlMain",
      root, writer, idStart.toString, n.toString,
      day.map(_.toString).getOrElse("-"))
    val child = new ProcessBuilder(cmd: _*).start()
    val out = new String(child.getInputStream.readAllBytes())
    val err = new String(child.getErrorStream.readAllBytes())
    child.waitFor()
    withClue(s"child stderr tail:\n${err.takeRight(2000)}\n") {
      child.exitValue() shouldBe 0
      out should include(s"XPDML_COMMITTED $writer")
    }
  }

  /** Arm the commit-attempt seam to run `race` exactly once. */
  private def raceOnce(t: ManagedTable)(race: => Unit): Unit = {
    t.onReplaceCommitAttempt = () => {
      t.onReplaceCommitAttempt = () => ()
      race
    }
  }

  private def dataDirs(root: String): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
    var dirs = Set.empty[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) dirs += p.getParent.getName
    }
    dirs
  }

  test("DELETE rebases over another PROCESS's stats-disjoint append") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val seedDirs = dataDirs(root)
    val v0 = t.currentVersion.get
    raceOnce(t) { forkAppend(root, "B", idStart = 5000L, n = 20, day = None) }
    t.delete("id < 50") shouldBe 50L
    // one child commit + one (rebased) delete commit
    t.currentVersion shouldBe Some(v0 + 2)
    t.history().head.operation shouldBe "delete"
    // both effects present: child's rows survived, victims gone
    val left = t.read().select("id").collect().map(_.getLong(0)).sorted
    left shouldBe ((50L until 100L) ++ (5000L until 5020L)).toArray
    // nothing orphaned: disk = live entries + the delete's removed seed
    // file (which time travel still references until vacuum)
    val live = t.manifest.get.files.map(_.path.split('/')(1)).toSet
    dataDirs(root) shouldBe (live ++ seedDirs)
  }

  test("DELETE surfaces the conflict when another PROCESS appends " +
      "rows inside its predicate, sweeping its written rewrite") {
    val root = tmp() + "/t2"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val dirsBefore = dataDirs(root)
    // child ids 10..29 sit INSIDE `id < 50`: footer stats cannot exclude
    // them, so the rebase must refuse — deleting on the stale read would
    // silently miss rows the predicate now matches
    raceOnce(t) { forkAppend(root, "B", idStart = 10L, n = 20, day = None) }
    intercept[ConcurrentWriteException] { t.delete("id < 50") }
    // nothing deleted, nothing lost: seed + child rows all present
    t.read().count() shouldBe 120L
    t.read().filter(col("writer") === "B").count() shouldBe 20L
    // the loser's written-but-never-committed rewrite dir was swept:
    // exactly the seed dir + the child's commit dir remain
    dataDirs(root).size shouldBe dirsBefore.size + 1
  }

  test("partition-scoped metadata DELETE rebases over an out-of-partition " +
      "append from another process and conflicts on an in-partition one") {
    val root = tmp() + "/t3"
    val t = ManagedTable(spark, root)
    t.overwriteAll(
      dayRows(0, 50, day = 1).unionByName(dayRows(50, 100, day = 2)),
      partitionBy = Seq("day"))
    val v0 = t.currentVersion.get

    // out-of-partition rival (day=3) → metadata-only delete rebases
    raceOnce(t) { forkAppend(root, "B", idStart = 5000L, n = 10, day = Some(3)) }
    t.delete("day = 1") shouldBe 50L
    t.currentVersion shouldBe Some(v0 + 2)
    t.read().filter(col("day") === 1).count() shouldBe 0L
    t.read().filter(col("day") === 3).count() shouldBe 10L

    // in-partition rival (day=2) → the winner's add lands in the exact
    // partition being dropped: must surface, and the winner's rows live
    raceOnce(t) { forkAppend(root, "C", idStart = 6000L, n = 10, day = Some(2)) }
    intercept[ConcurrentWriteException] { t.delete("day = 2") }
    t.read().filter(col("day") === 2).count() shouldBe 60L
    t.read().filter(col("writer") === "C").count() shouldBe 10L
  }
}
