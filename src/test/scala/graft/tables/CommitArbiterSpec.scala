package graft.tables

import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** The commit protocol's atomic-publish seam ([[CommitArbiter]]): every
  * implementation must give the same two contracts — put-if-absent
  * arbitration (one winner, loser gets [[ConcurrentWriteException]],
  * winner's content intact) and atomic overwrite publish — and the whole
  * table stack must behave identically on top of each. */
class CommitArbiterSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def arbiters(dir: Path): Seq[(String, CommitArbiter)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    Seq(
      "rename" -> new RenameCommitArbiter(fs,
        FileContext.getFileContext(dir.toUri, conf), dir),
      "posix" -> new PosixCommitArbiter(dir),
      "condput" -> new ConditionalPutCommitArbiter(fs))
  }

  test("primitive contract: put-if-absent arbitrates, atomic publish " +
      "replaces — identically across all three implementations") {
    val base = Files.createTempDirectory("graft-arb").toString
    arbiters(new Path(base)).foreach { case (name, a) =>
      val dir = new Path(base, name)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(dir)
      val rec = new Path(dir, "v1.json")
      withClue(s"arbiter $name:\n") {
        a.putIfAbsent(rec, "winner")
        // the loser must throw AND leave the winner's content intact
        intercept[ConcurrentWriteException](a.putIfAbsent(rec, "loser"))
        val in = fs.open(rec)
        val content = try new String(in.readAllBytes(), "UTF-8")
        finally in.close()
        content shouldBe "winner"
        // atomic publish replaces repeatedly
        val ptr = new Path(dir, "_current")
        a.putAtomic(ptr, "1")
        a.putAtomic(ptr, "2")
        val in2 = fs.open(ptr)
        val v = try new String(in2.readAllBytes(), "UTF-8") finally in2.close()
        v shouldBe "2"
      }
    }
  }

  test("full table lifecycle is arbiter-independent: create, append, DML, " +
      "time travel, restore under rename, posix, and the hostile-store " +
      "conditional-put arbiter") {
    import spark.implicits._
    Seq("rename", "posix", "condput").foreach { which =>
      spark.conf.set("spark.graft.commit.arbiter", which)
      try {
        val root = Files.createTempDirectory(s"graft-arb-$which").toString + "/t"
        val t = ManagedTable(spark, root)
        withClue(s"arbiter $which:\n") {
          t.overwriteAll(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
          t.append(Seq((4, "d")).toDF("id", "v"))
          t.delete("id = 2") shouldBe 1L
          t.update(Map("v" -> "'x'"), "id = 3") shouldBe 1L
          t.read().orderBy("id").collect()
            .map(r => (r.getInt(0), r.getString(1))) shouldBe
            Array((1, "a"), (3, "x"), (4, "d"))
          t.readVersion(0).count() shouldBe 3
          t.restore(1)
          t.read().count() shouldBe 4
          // racing writers through two handles still arbitrate: the
          // rebasing append path digests the conflict, the final state
          // holds both rows
          val h1 = ManagedTable(spark, root)
          val h2 = ManagedTable(spark, root)
          h1.append(Seq((10, "r1")).toDF("id", "v"))
          h2.append(Seq((11, "r2")).toDF("id", "v"))
          ManagedTable(spark, root).read().count() shouldBe 6
        }
      } finally spark.conf.unset("spark.graft.commit.arbiter")
    }
  }
}
