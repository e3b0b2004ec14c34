package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Commit-directory layout contract: a committed `data/<uuid>/` tree holds
  * ONLY data files. The write path commits task output executor-side
  * (committer algorithm v2 — the commit dir is invisible until the
  * manifest references it, so the v1 driver-side sequential rename pass
  * buys nothing) and skips the `_SUCCESS` marker (the manifest, not a
  * marker, is the commit record). These tests pin that contract: a
  * regression that re-introduces `_temporary` leftovers or marker files
  * would silently bloat every commit and, on object stores, restore the
  * O(files) driver-side rename bottleneck. */
class CommitLayoutSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-commit-layout").toString

  private def walk(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids ++ kids.filter(_.isDirectory).flatMap(walk)
  }

  private def assertCleanDataTree(root: String): Unit = {
    val data = new java.io.File(root, "data")
    assert(data.isDirectory, s"no data dir under $root")
    val entries = walk(data)
    val bad = entries.filter { f =>
      f.getName == "_SUCCESS" || f.getName.startsWith("_temporary")
    }
    bad shouldBe empty
    // every visible regular file in the tree is a parquet data file
    // (dotfiles are the checksummed local FS's .crc twins — test-env
    // noise, invisible to parquet listings)
    entries.filter(f => f.isFile && !f.getName.startsWith(".")).foreach { f =>
      assert(f.getName.endsWith(".parquet"),
        s"non-parquet file in commit tree: $f")
    }
  }

  test("unpartitioned commits leave only parquet files") {
    import spark.implicits._
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(Seq((1, "a"), (2, "b")).toDF("id", "v").repartition(3))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.delete("id = 1")
    assertCleanDataTree(root)
    t.read().count() shouldBe 2
  }

  test("partitioned dynamic-overwrite commits leave only parquet files") {
    import spark.implicits._
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    val rows = Seq((1, "x", "p1"), (2, "y", "p2"), (3, "z", "p1"))
      .toDF("id", "v", "part")
    t.overwriteAll(rows, partitionBy = Seq("part"))
    t.overwriteDynamic(Seq((9, "w", "p2")).toDF("id", "v", "part"),
      partitionBy = Seq("part"))
    assertCleanDataTree(root)
    t.read().count() shouldBe 3
    // manifest's file inventory matches the on-disk tree exactly: the
    // v2 committer must not leave duplicate task-attempt output behind
    val listed = walk(new java.io.File(root, "data")).filter(_.isFile)
      .map(_.getAbsolutePath.stripPrefix(new java.io.File(root).getAbsolutePath + "/"))
      .toSet
    val live = t.manifest.get.files.map(_.path).toSet
    // dropped dynamic-partition files remain on disk until vacuum; the
    // LIVE set must be a subset of the tree with no phantom entries
    assert(live.subsetOf(listed), s"manifest references missing files: ${live -- listed}")
  }
}
