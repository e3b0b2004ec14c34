package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** TWO-PROCESS commit-race coverage: every other concurrency spec in
  * this suite races threads inside one JVM, where the in-process write
  * lock serializes writers and the put-if-absent record create is never
  * truly contested across OS processes. Here a forked child JVM
  * ([[CrossProcessWriterMain]]) appends against the same table root as
  * this JVM, so the only arbitration left is the atomic
  * create-if-absent of the commit record — exactly what a multi-driver
  * deployment relies on. */
class CrossProcessWriterSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-xpw").toString

  /** The forked JVM mirrors this one: same classpath, the JDK-17
    * add-opens Spark needs, modest heap. */
  private def forkWriter(root: String, writer: String, nCommits: Int,
      rowsPerCommit: Int): Process = {
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
      "graft.tables.CrossProcessWriterMain",
      root, writer, nCommits.toString, rowsPerCommit.toString)
    new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
  }

  test("two JVMs appending concurrently lose no commits, orphan no files") {
    import spark.implicits._
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(Seq(("seed-0", "seed")).toDF("id", "writer"))
    val v0 = t.currentVersion.get

    val nCommits = 5
    val rows = 20
    val child = forkWriter(root, "B", nCommits, rows)
    // parent writer races the child from THIS JVM
    (1 to nCommits).foreach { i =>
      t.append((1 to rows).map(r => (s"A-$i-$r", "A")).toDF("id", "writer"))
    }
    val childOut = new String(child.getInputStream.readAllBytes())
    val childErr = new String(child.getErrorStream.readAllBytes())
    child.waitFor()
    withClue(s"child stderr tail:\n${childErr.takeRight(2000)}\n") {
      child.exitValue() shouldBe 0
      childOut should include(s"XPW_COMMITTED B $nCommits")
    }

    // no commit lost: every version advanced exactly once per append
    t.currentVersion.get shouldBe v0 + 2 * nCommits
    val byWriter = t.read().groupBy("writer").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byWriter shouldBe Map(
      "seed" -> 1L, "A" -> (nCommits * rows).toLong,
      "B" -> (nCommits * rows).toLong)

    // no orphaned files: appends remove nothing, so every parquet under
    // data/ must be referenced by the live manifest (a lost rebase that
    // re-wrote its data would show up here as an unreferenced dir)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet"))
          b += p.toUri.getPath.stripPrefix(
            fs.makeQualified(new org.apache.hadoop.fs.Path(root))
              .toUri.getPath).stripPrefix("/")
      }
      b.result()
    }
    val live = t.manifest.get.files.map(_.path).toSet
    onDisk shouldBe live
  }

  test("append exhausting retries against a stalled external record " +
      "fails cleanly and sweeps its written files") {
    import spark.implicits._
    val root = tmp() + "/t2"
    val t = ManagedTable(spark, root)
    t.overwriteAll(Seq(("seed-0", "seed")).toDF("id", "writer"))
    val before = t.read().collect().map(_.getString(0)).sorted

    // an external process left a TORN record at the next version (it
    // "parses" as JSON but is self-inconsistent, so the roll-forward
    // healer must refuse to publish it): the put-if-absent create keeps
    // losing while the manifest head never moves, so the rebase loop
    // must exhaust and surface ConcurrentWriteException — NOT adopt the
    // garbage, NOT spin forever, NOT leak the files it wrote
    val next = t.currentVersion.get + 1
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rec = new org.apache.hadoop.fs.Path(root,
      f"_graft/manifests/v$next%020d.json")
    val out = fs.create(rec, false)
    out.write("{}".getBytes("UTF-8")); out.close()

    intercept[ConcurrentWriteException] {
      t.append(Seq(("x-1", "X")).toDF("id", "writer"))
    }
    // table unharmed and readable
    t.read().collect().map(_.getString(0)).sorted shouldBe before
    // the failed attempt's commit dir was swept — only the seed commit's
    // files remain under data/
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(root, "data"), true)
    var dirs = Set.empty[String]
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet")) dirs += p.getParent.getName
    }
    dirs.size shouldBe 1

    // clearing the stalled record lets the same writer proceed
    fs.delete(rec, false)
    t.append(Seq(("x-1", "X")).toDF("id", "writer"))
    t.read().count() shouldBe before.length + 1
  }
}
