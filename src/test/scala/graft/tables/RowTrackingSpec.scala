package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Row tracking (Delta row IDs): stable per-row identity allocated at
  * commit time (`baseRowId + row_index`), preserved across row-preserving
  * rewrites via the materialized `_graft_row_id` column — compaction,
  * Z-order, DV masking, copy-on-write DML. */
class RowTrackingSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-rowtrack").toString

  /** key → row ID map of the current snapshot. */
  def ids(t: ManagedTable): Map[Long, Long] =
    t.readWithRowIds().select("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  def freshTable(n: Long = 100L): ManagedTable = {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1L to n / 2).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(3))
    t.append((n / 2 + 1 to n).map(i => (i, s"v$i")).toDF("k", "s")
      .repartition(2))
    t.enableRowTracking()
    t
  }

  test("enable backfills existing files; IDs are unique and dense-ranged") {
    val t = freshTable(100)
    val m = t.manifest.get
    m.files.forall(_.baseRowId.isDefined) shouldBe true
    val hw = m.properties(ManagedTable.RowTrackingWatermarkProp).toLong
    hw shouldBe 100L
    val assigned = ids(t)
    assigned.size shouldBe 100
    assigned.values.toSeq.distinct.size shouldBe 100
    all(assigned.values) should (be >= 0L and be < hw)
  }

  test("append allocates fresh non-overlapping ranges") {
    import spark.implicits._
    val t = freshTable(100)
    val before = ids(t)
    t.append((101L to 130L).map(i => (i, s"v$i")).toDF("k", "s"))
    val after = ids(t)
    after.size shouldBe 130
    after.values.toSeq.distinct.size shouldBe 130
    // old rows keep their IDs; new rows land above the old watermark
    before.foreach { case (k, id) => after(k) shouldBe id }
    (101L to 130L).foreach(k => after(k) should be >= 100L)
  }

  test("compaction preserves every row's ID") {
    val t = freshTable(100)
    val before = ids(t)
    t.compact()
    t.manifest.get.files.size shouldBe 1
    ids(t) shouldBe before
  }

  test("Z-order reorders rows but preserves IDs; recompaction keeps them again") {
    val t = freshTable(200)
    val before = ids(t)
    t.zorder(Seq("k"), targetFiles = 3)
    ids(t) shouldBe before
    // a second rewrite reads the materialized column back and carries it
    t.compact()
    ids(t) shouldBe before
  }

  test("copy-on-write DELETE keeps survivors' IDs; UPDATE keeps updated rows' IDs") {
    val t = freshTable(100)
    val before = ids(t)
    t.delete("k % 10 = 0") shouldBe 10L
    val afterDelete = ids(t)
    afterDelete.size shouldBe 90
    afterDelete.foreach { case (k, id) => before(k) shouldBe id }
    t.update(Map("s" -> "concat(s, '!')"), "k % 7 = 0") shouldBe 13L
    val afterUpdate = ids(t)
    afterUpdate.size shouldBe 90
    afterUpdate.foreach { case (k, id) => before(k) shouldBe id }
    // the updated content really changed
    t.read().filter("k = 7").select("s").collect()(0).getString(0) shouldBe "v7!"
  }

  test("DV-mode DELETE preserves IDs for free; DV UPDATE images keep theirs") {
    val t = freshTable(100)
    val before = ids(t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      t.delete("k % 10 = 0") shouldBe 10L
      t.manifest.get.files.exists(_.dv.nonEmpty) shouldBe true
      val afterDelete = ids(t)
      afterDelete.size shouldBe 90
      afterDelete.foreach { case (k, id) => before(k) shouldBe id }
      // MoR UPDATE: old position masked, image appended to a fresh file —
      // the image carries the materialized ID
      t.update(Map("s" -> "'upd'"), "k = 3") shouldBe 1L
      val afterUpdate = ids(t)
      afterUpdate(3L) shouldBe before(3L)
      afterUpdate.size shouldBe 90
      // purge (REORG) materializes the masks away and keeps IDs
      t.purgeDeletionVectors()
      t.manifest.get.files.forall(_.dv.isEmpty) shouldBe true
      ids(t) shouldBe afterUpdate
    } finally spark.conf.set("spark.graft.dv.enabled", "false")
  }

  test("IDs survive a parquet-sidecar checkpoint roundtrip") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/ckpt")
    t.overwriteAll((1L to 50L).map(i => (i, i * 2)).toDF("k", "v")
      .repartition(4))
    t.enableRowTracking()
    val before = ids(t)
    t.setTableProperties(Map("graft.manifest.parquetCheckpointThreshold" -> "1"))
    t.append((51L to 60L).map(i => (i, i * 2)).toDF("k", "v"))
    // force a full checkpoint record (sidecar path) and reread cold
    (0 until 10).foreach(_ => t.append(Seq((0L, 0L)).toDF("k", "v")))
    val t2 = ManagedTable(spark, t.rootPath)
    val after = t2.readWithRowIds().select("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    before.foreach { case (k, id) => after(k) shouldBe id }
    t2.manifest.get.files.forall(_.baseRowId.isDefined) shouldBe true
  }

  test("guards: read before enable throws; rowTracking properties are engine-owned") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/g")
    t.overwriteAll(Seq((1L, "a")).toDF("k", "s"))
    a[MetadataException] should be thrownBy t.readWithRowIds()
    a[MetadataException] should be thrownBy
      t.setTableProperties(Map(ManagedTable.RowTrackingEnabledProp -> "true"))
    t.enableRowTracking()
    a[MetadataException] should be thrownBy
      t.unsetTableProperties(Seq(ManagedTable.RowTrackingEnabledProp))
    // enabling twice is a no-op, not a second commit
    val v = t.manifest.get.version
    t.enableRowTracking()
    t.manifest.get.version shouldBe v
  }

  test("keyed MERGE preserves IDs for carried and updated rows; inserts get fresh IDs") {
    import spark.implicits._
    val t = freshTable(100)
    val before = ids(t)
    val src = Seq((3L, "upd3"), (47L, "upd47"), (200L, "new200"))
      .toDF("k", "s")
    val metrics = MergeInto.byKey(t, src, "k")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    metrics.count("m0") shouldBe 2L
    metrics.count("nm1") shouldBe 1L
    val after = ids(t)
    after.size shouldBe 101
    after.values.toSeq.distinct.size shouldBe 101
    // every pre-existing row — updated or carried through the touched
    // files' rewrite — keeps its ID; the insert lands above the watermark
    before.foreach { case (k, id) => after(k) shouldBe id }
    after(200L) should be >= 100L
    t.read().filter("k = 3").select("s").collect()(0).getString(0) shouldBe "upd3"
  }

  test("DV-mode MERGE and generic-condition MERGE both preserve IDs") {
    import spark.implicits._
    val t = freshTable(100)
    val before = ids(t)
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      MergeInto.byKey(t, Seq((5L, "dv5")).toDF("k", "s"), "k")
        .whenMatchedUpdateAll().execute()
    } finally spark.conf.set("spark.graft.dv.enabled", "false")
    val afterDv = ids(t)
    afterDv.size shouldBe 100
    before.foreach { case (k, id) => afterDv(k) shouldBe id }
    // generic path (non-equi condition): partition-granular rewrite still
    // carries identity for matched and untouched rows
    MergeInto(t, Seq((10L, "gen")).toDF("k", "s"),
        "target.k = source.k AND source.k > 1")
      .whenMatchedUpdateAll().execute()
    val afterGen = ids(t)
    afterGen.size shouldBe 100
    before.foreach { case (k, id) => afterGen(k) shouldBe id }
    t.read().filter("k = 10").select("s").collect()(0).getString(0) shouldBe "gen"
  }

  test("row commit versions: fresh rows report their commit, updates move, rewrites preserve") {
    import spark.implicits._
    val t = freshTable(100) // v0 overwrite, v1 append, v2 enable
    def cvs: Map[Long, Long] =
      t.readWithRowMeta().select("k", "_row_commit_version").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val initial = cvs
    (1L to 50L).foreach(k => initial(k) shouldBe 0L)
    (51L to 100L).foreach(k => initial(k) shouldBe 1L)
    // row-preserving rewrite: versions carry through
    t.compact() // v3
    cvs shouldBe initial
    // update moves ONLY the touched row's version to the update's commit
    t.update(Map("s" -> "'u'"), "k = 3") // v4
    val afterUpd = cvs
    afterUpd(3L) shouldBe 4L
    (afterUpd - 3L) shouldBe (initial - 3L)
    // delete: survivors keep theirs (including through the file rewrite)
    t.delete("k % 10 = 0") // v5
    val afterDel = cvs
    afterDel.size shouldBe 90
    afterDel.foreach { case (k, v) => v shouldBe afterUpd(k) }
    // merge: updated row moves to the merge's commit, insert reports it too
    MergeInto.byKey(t, Seq((7L, "m7"), (300L, "new")).toDF("k", "s"), "k")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute() // v6
    val afterMerge = cvs
    afterMerge(7L) shouldBe 6L
    afterMerge(300L) shouldBe 6L
    afterMerge(8L) shouldBe afterDel(8L)
    // zorder after all of it still preserves everything
    t.zorder(Seq("k")) // v7
    cvs shouldBe afterMerge
  }

  test("row commit versions under DV: masks preserve, MoR update images move") {
    import spark.implicits._
    val t = freshTable(60) // v0, v1, v2
    def cvs: Map[Long, Long] =
      t.readWithRowMeta().select("k", "_row_commit_version").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val initial = cvs
    spark.conf.set("spark.graft.dv.enabled", "true")
    try {
      t.delete("k % 6 = 0") // v3: masks only
      val afterDel = cvs
      afterDel.size shouldBe 50
      afterDel.foreach { case (k, v) => v shouldBe initial(k) }
      t.update(Map("s" -> "'dvu'"), "k = 11") // v4: mask + image append
      val afterUpd = cvs
      afterUpd(11L) shouldBe 4L
      (afterUpd - 11L) shouldBe (afterDel - 11L)
    } finally spark.conf.set("spark.graft.dv.enabled", "false")
    t.purgeDeletionVectors() // v5: materializing rewrite preserves
    val afterPurge = cvs
    afterPurge(11L) shouldBe 4L
    afterPurge.size shouldBe 50
  }

  test("clones carry IDs; the logical schema never shows _graft_row_id") {
    val t = freshTable(40)
    t.compact() // materialized column now physically present
    val before = ids(t)
    t.read().columns should not contain ManagedTable.MatRowIdCol
    t.manifest.get.schema.fieldNames should not contain ManagedTable.MatRowIdCol
    val c = tmp() + "/clone"
    t.shallowCloneTo(c)
    val tc = ManagedTable(spark, c)
    ids(tc) shouldBe before
    // the clone allocates its own subsequent ranges from the inherited
    // watermark — appends there never collide with inherited IDs
    import spark.implicits._
    tc.append(Seq((999L, "x")).toDF("k", "s"))
    val after = ids(tc)
    after.size shouldBe 41
    after.values.toSeq.distinct.size shouldBe 41
  }
}
