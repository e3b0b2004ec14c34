package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Merge-on-read deletion vectors: row-level DELETE/UPDATE masks
  * positions in a parquet sidecar instead of rewriting data files
  * (Delta's DV write path, re-expressed as a `_metadata.row_index`
  * anti-join). */
class DeletionVectorSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-dv").toString

  def df(rows: Seq[(Int, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "name", "part")
  }

  /** Run `f` with deletion vectors on (restores the previous setting). */
  def withDv[A](f: => A): A = {
    spark.conf.set("spark.graft.dv.enabled", "true")
    try f finally spark.conf.unset("spark.graft.dv.enabled")
  }

  def dataPaths(t: ManagedTable): Set[String] =
    t.manifest.get.files.map(_.path).toSet

  test("DV delete: no data file rewritten, rows masked, counts exact") {
    val t = ManagedTable(spark, tmp() + "/dv1")
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))))
    val before = dataPaths(t)
    val matched = withDv { t.delete("id <= 10") }
    matched shouldBe 10L
    // same physical files, now carrying a DV reference
    dataPaths(t) shouldBe before
    // only files that actually contained matched rows carry a DV
    val entries = t.manifest.get.files
    entries.count(_.dv.isDefined) should be >= 1
    entries.flatMap(_.dvRows).sum shouldBe 10L
    t.read().count() shouldBe 90L
    t.read().agg(min("id")).head.getInt(0) shouldBe 11
    t.fastCount shouldBe Some(90L)
    // history records the delete; time travel sees the pre-delete rows
    t.readVersion(0).count() shouldBe 100L
  }

  test("repeated DV deletes union positions; full-file delete drops the entry") {
    val t = ManagedTable(spark, tmp() + "/dv2")
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))).coalesce(1))
    withDv {
      t.delete("id <= 10") shouldBe 10L
      t.delete("id <= 25") shouldBe 15L // 1-10 already masked: only live rows count
    }
    val f = { val fs = t.manifest.get.files; fs.size shouldBe 1; fs.head }
    f.dvRows shouldBe Some(25L)
    t.read().count() shouldBe 75L
    // a delete wiping every remaining row drops the file as pure metadata
    val v = t.currentVersion.get
    withDv { t.delete("id > 0") shouldBe 75L }
    t.manifest.get.files shouldBe empty
    t.read().count() shouldBe 0L
    t.readVersion(v).count() shouldBe 75L
  }

  test("over-fraction delete falls back to a classic rewrite of that file") {
    val t = ManagedTable(spark, tmp() + "/dv3")
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))).coalesce(1))
    val before = dataPaths(t)
    val matched = withDv { t.delete("id <= 80") } // 80% > default 0.5 cap
    matched shouldBe 80L
    val f = { val fs = t.manifest.get.files; fs.size shouldBe 1; fs.head }
    f.dv shouldBe None // rewritten clean, not masked
    before should not contain f.path
    t.read().count() shouldBe 20L
  }

  test("DV update: masked in place, updated images appended, equals classic semantics") {
    val t = ManagedTable(spark, tmp() + "/dv4")
    t.overwriteAll(df((1 to 50).map(i => (i, s"n$i", "x"))).coalesce(1))
    val origPath = dataPaths(t).head
    val matched = withDv { t.update(Map("name" -> "upper(name)"), "id <= 5") }
    matched shouldBe 5L
    val m = t.manifest.get
    // original file survives with a DV; the updated images landed fresh
    m.files.map(_.path) should contain(origPath)
    m.files.find(_.path == origPath).get.dvRows shouldBe Some(5L)
    m.files.size should be > 1
    t.read().count() shouldBe 50L
    t.read().filter("id <= 5").select("name").collect()
      .map(_.getString(0)).sorted shouldBe Array("N1", "N2", "N3", "N4", "N5")
    t.read().filter("id = 6").head.getString(1) shouldBe "n6"
  }

  test("partition-only delete stays metadata-only (never a DV)") {
    val t = ManagedTable(spark, tmp() + "/dv5")
    t.overwriteAll(df(Seq((1, "a", "x"), (2, "b", "y"))), Seq("part"))
    val v = t.currentVersion.get
    withDv { t.delete("part = 'x'") shouldBe 1L }
    // entry dropped outright; no sidecar written
    t.manifest.get.files.flatMap(_.dv) shouldBe empty
    t.read().count() shouldBe 1L
    t.currentVersion shouldBe Some(v + 1)
  }

  test("purge materializes DVs; vacuum collects orphaned sidecars") {
    val root = tmp() + "/dv6"
    val t = ManagedTable(spark, root)
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))))
    withDv { t.delete("id <= 10") }
    val dvDir = new java.io.File(root, "_graft/_dv")
    dvDir.listFiles.length shouldBe 1
    t.purgeDeletionVectors()
    t.manifest.get.files.foreach(_.dv shouldBe None)
    t.read().count() shouldBe 90L
    t.fastCount shouldBe Some(90L)
    // pre-purge version still reads through its DV
    t.readVersion(t.currentVersion.get - 1).count() shouldBe 90L
    t.vacuum()
    dvDir.listFiles.toSeq shouldBe empty
    t.read().count() shouldBe 90L
  }

  test("vacuum keeps sidecars a retained version still references") {
    val root = tmp() + "/dv7"
    val t = ManagedTable(spark, root)
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))))
    withDv { t.delete("id <= 10") }
    t.vacuum() // current version references the DV — must survive
    new java.io.File(root, "_graft/_dv").listFiles.length shouldBe 1
    t.read().count() shouldBe 90L
  }

  test("keyed merge into a DV-carrying target applies the mask and clears it on rewrite") {
    val t = ManagedTable(spark, tmp() + "/dv8")
    t.overwriteAll(df((1 to 20).map(i => (i, s"n$i", "x"))).coalesce(1))
    withDv { t.delete("id = 3") }
    val src = df(Seq((3, "back", "x"), (5, "five", "x")))
    MergeInto.byKey(t, src, "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val out = t.read().filter("id in (3, 5)").collect()
    // id=3 was DV-deleted → merge saw no match → insert; id=5 updated
    out.map(r => (r.getInt(0), r.getString(1))).sorted shouldBe
      Array((3, "back"), (5, "five"))
    t.read().count() shouldBe 20L
    // the touched file was rewritten clean
    t.manifest.get.files.flatMap(_.dv) shouldBe empty
  }

  test("change feed surfaces DV-masked rows as deletes") {
    val t = ManagedTable(spark, tmp() + "/dv9")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", "x"))))
    val v0 = t.currentVersion.get
    withDv { t.delete("id in (2, 7)") }
    val feed = t.rowChanges(v0, t.currentVersion.get, Seq("id"))
    feed.collect().map(r => (r.getInt(0), r.getString(3))).sorted shouldBe
      Array((2, "delete"), (7, "delete"))
  }

  test("shallow clone of a DV-carrying table reads correctly; purge makes it self-contained") {
    val src = ManagedTable(spark, tmp() + "/dv10src")
    src.overwriteAll(df((1 to 30).map(i => (i, s"n$i", "x"))))
    withDv { src.delete("id <= 5") }
    val clone = src.shallowCloneTo(tmp() + "/dv10clone")
    clone.read().count() shouldBe 25L
    clone.purgeDeletionVectors()
    clone.read().count() shouldBe 25L
    clone.manifest.get.files.foreach(_.dv shouldBe None)
    // clone's vacuum never touches the source's sidecars
    clone.vacuum()
    src.read().count() shouldBe 25L
  }

  test("CHECK constraints veto a DV update whose images violate them") {
    val t = ManagedTable(spark, tmp() + "/dv11")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", "x"))))
    t.addConstraint("id_pos", "id > 0")
    withDv {
      intercept[ConstraintViolationException] {
        t.update(Map("id" -> "-id"), "id = 4")
      }
      // delete never writes rows — constraints don't block it
      t.delete("id = 4") shouldBe 1L
    }
    t.read().count() shouldBe 9L
  }

  test("DV-mode keyed merge: masks + appends instead of rewriting touched files") {
    val t = ManagedTable(spark, tmp() + "/dvm1")
    t.overwriteAll(df((1 to 100).map(i => (i, s"n$i", "x"))).repartition(4))
    val before = dataPaths(t)
    val src = df(Seq((7, "seven", "x"), (42, "forty-two", "x"),
      (101, "new", "x")))
    val metrics = withDv {
      MergeInto.byKey(t, src, "id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }
    metrics.count("m0") shouldBe 2L // updated
    metrics.count("nm1") shouldBe 1L // inserted
    // every pre-merge file survives byte-for-byte (no rewrite) …
    val after = t.manifest.get.files
    before.subsetOf(after.map(_.path).toSet) shouldBe true
    // … the matched rows' files now carry masks, images+insert appended
    after.flatMap(_.dvRows).sum shouldBe 2L
    t.read().count() shouldBe 101L
    t.read().filter("id = 7").head.getString(1) shouldBe "seven"
    t.read().filter("id = 42").head.getString(1) shouldBe "forty-two"
    t.read().filter("id = 101").head.getString(1) shouldBe "new"
    t.read().filter("id = 8").head.getString(1) shouldBe "n8"
    t.fastCount shouldBe Some(101L)
  }

  test("DV-mode merge equals classic merge observationally (incl. deletes + bySource)") {
    def run(dv: Boolean): (Seq[(Int, String)], MergeBuilder.MergeMetrics) = {
      val t = ManagedTable(spark, tmp() + s"/dvm2_$dv")
      t.overwriteAll(df((1 to 60).map(i => (i, s"n$i", "x"))).repartition(3))
      val src = df((40 to 70).map(i => (i, s"u$i", "x")))
      val exec = MergeInto.byKey(t, src, "id")
        .whenMatchedDelete(Some("source.id % 5 = 0"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .whenNotMatchedBySourceDelete(Some("target.id < 5"))
      val metrics = if (dv) withDv { exec.execute() } else exec.execute()
      (t.read().collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq,
        metrics)
    }
    val (classicRows, classicM) = run(dv = false)
    val (dvRows, dvM) = run(dv = true)
    dvRows shouldBe classicRows
    dvM shouldBe classicM
  }

  test("DV-mode merge: repeated small upserts never rewrite, purge reclaims") {
    val t = ManagedTable(spark, tmp() + "/dvm3")
    t.overwriteAll(df((1 to 1000).map(i => (i, s"n$i", "x"))).coalesce(1))
    val before = dataPaths(t)
    withDv {
      (1 to 3).foreach { round =>
        val src = df(Seq((round * 10, s"r$round", "x")))
        MergeInto.byKey(t, src, "id")
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      }
    }
    // original file survived three upserts; masks accumulated
    before.subsetOf(dataPaths(t)) shouldBe true
    t.manifest.get.files.find(f => before.contains(f.path)).get
      .dvRows shouldBe Some(3L)
    t.read().count() shouldBe 1000L
    (1 to 3).foreach { round =>
      t.read().filter(s"id = ${round * 10}").head.getString(1) shouldBe s"r$round"
    }
    t.purgeDeletionVectors()
    t.manifest.get.files.flatMap(_.dv) shouldBe empty
    t.read().count() shouldBe 1000L
  }

  test("streaming upsert sink under DV: CDC batches mask instead of rewriting") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = tmp() + "/dvm4"
    val t = ManagedTable(spark, root + "/t")
    t.overwriteAll(df((1 to 50).map(i => (i, s"n$i", "x"))).coalesce(1))
    val before = dataPaths(t)
    val in = MemoryStream[(Int, String, String)](spark)
    withDv {
      val q = in.toDF().toDF("id", "name", "part")
        .writeStream
        .format(classOf[graft.streaming.TableSinkProvider].getName)
        .option("path", t.rootPath)
        .option("checkpointLocation", root + "/ckpt")
        .option("mode", "upsert").option("mergeKey", "id")
        .outputMode(OutputMode.Update())
        .start()
      try {
        in.addData((3, "three", "x"), (51, "fifty-one", "x"))
        q.processAllAvailable()
      } finally q.stop()
    }
    before.subsetOf(dataPaths(t)) shouldBe true // masked, not rewritten
    t.read().count() shouldBe 51L
    t.read().filter("id = 3").head.getString(1) shouldBe "three"
  }

  test("streaming source re-emits a DV-re-masked file with the mask applied") {
    val t = ManagedTable(spark, tmp() + "/dv12")
    t.overwriteAll(df((1 to 10).map(i => (i, s"n$i", "x"))))
    withDv { t.delete("id <= 3") }
    // batch semantics of the source's per-version file list: the DV
    // commit re-lists the masked file, read under the new mask
    val ckpt = tmp() + "/dv12ckpt"
    val q = spark.readStream
      .format(classOf[graft.streaming.TableStreamProvider].getName)
      .option("path", t.rootPath)
      .load()
      .writeStream.format("memory").queryName("dv12out")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      spark.table("dv12out").count() shouldBe 7L
    } finally q.stop()
  }
}
