package graft.tables

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.core.SchemaDrift
import graft.metadata.Metadata

class MaintenanceSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._
  def tmp(): String = Files.createTempDirectory("graft-maint").toString

  test("compact merges small files per partition, preserves data + history") {
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll(Seq((1, "a", "x"), (2, "b", "y")).toDF("id", "v", "p"), Seq("p"))
    t.append(Seq((3, "c", "x")).toDF("id", "v", "p"))
    t.append(Seq((4, "d", "x")).toDF("id", "v", "p"))
    val before = t.manifest.get.files
    before.count(_.partitionValues.get("p").contains("x")) shouldBe 3
    val yFiles = before.filter(_.partitionValues.get("p").contains("y"))

    t.compact()
    val after = t.manifest.get.files
    after.count(_.partitionValues.get("p").contains("x")) shouldBe 1
    // partition y had one file: untouched, same physical file
    after.filter(_.partitionValues.get("p").contains("y")) shouldBe yFiles
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3, 4)
    // previous version still readable (time travel preserved until vacuum)
    t.readVersion(t.currentVersion.get - 1).count() shouldBe 4
  }

  test("compact on unpartitioned table coalesces to target file count") {
    val t = ManagedTable(spark, tmp() + "/t2")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.manifest.get.files.size should be >= 3
    t.compact()
    t.manifest.get.files.size shouldBe 1
    t.read().count() shouldBe 3
  }

  test("compactSmall: bin-packs only sub-threshold files, big files carry verbatim") {
    import org.apache.spark.sql.functions.col
    val t = ManagedTable(spark, tmp() + "/tcs")
    t.overwriteAll(spark.range(50000).toDF("id")
      .withColumn("v", col("id").cast("string")).coalesce(1))
    val bigFile = t.manifest.get.files match { case Seq(f) => f }
    t.append(Seq((100001L, "a")).toDF("id", "v"))
    t.append(Seq((100002L, "b")).toDF("id", "v"))
    t.append(Seq((100003L, "c")).toDF("id", "v"))
    t.manifest.get.files.size shouldBe 4

    t.compactSmall(smallBytes = 20 * 1024)
    val after = t.manifest.get.files
    // the big file's entry survives verbatim; the three small ones packed
    after should contain(bigFile)
    after.size shouldBe 2
    t.read().count() shouldBe 50003
    t.readVersion(t.currentVersion.get - 1).count() shouldBe 50003

    // second pass: nothing sub-threshold shares a partition -> no-op
    val v = t.currentVersion.get
    t.compactSmall(smallBytes = 20 * 1024)
    t.currentVersion.get shouldBe v
  }

  test("compactSmall on a partitioned table never mixes partitions") {
    val t = ManagedTable(spark, tmp() + "/tcp")
    t.overwriteAll(Seq((1, "a", "x")).toDF("id", "v", "p"), Seq("p"))
    t.append(Seq((2, "b", "x")).toDF("id", "v", "p"))
    t.append(Seq((3, "c", "y")).toDF("id", "v", "p"))
    val yFiles = t.manifest.get.files.filter(_.partitionValues.get("p").contains("y"))
    yFiles.size shouldBe 1

    t.compactSmall(smallBytes = 1024 * 1024)
    val after = t.manifest.get.files
    // y had a single small file: no partner to pack with -> untouched
    after.filter(_.partitionValues.get("p").contains("y")) shouldBe yFiles
    after.count(_.partitionValues.get("p").contains("x")) shouldBe 1
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
  }

  test("shallow clone: zero bytes copied, independent life, compact owns it") {
    val root = tmp()
    val src = ManagedTable(spark, root + "/src")
    src.overwriteAll(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val cl = src.shallowCloneTo(root + "/clone")

    cl.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    cl.fastCount shouldBe Some(2L) // row counts travel with the references
    // zero-copy: nothing under the clone's own data dir
    new java.io.File(root + "/clone/data").exists shouldBe false

    // the clone diverges independently; the source never sees its writes
    cl.append(Seq((3, "c")).toDF("id", "v"))
    cl.read().count() shouldBe 3
    src.read().count() shouldBe 2
    // and the clone is a snapshot: source appends don't leak in
    src.append(Seq((9, "z")).toDF("id", "v"))
    cl.read().count() shouldBe 3

    // compaction rewrites borrowed references into owned files
    cl.compact()
    cl.manifest.get.files.foreach(f => f.path should not startWith "file:")
    cl.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)

    a[graft.metadata.MetadataException] should be thrownBy
      src.shallowCloneTo(root + "/clone")

    // versioned clone: a zero-copy branch of a HISTORICAL snapshot
    val cl0 = src.shallowCloneTo(root + "/clone_v0", versionAsOf = Some(0L))
    cl0.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    src.vacuum() // drops v0 below the horizon
    a[graft.metadata.MetadataException] should be thrownBy
      src.shallowCloneTo(root + "/clone_v0b", versionAsOf = Some(0L))
  }

  test("detail: version, files, rows, bytes, latest operation") {
    val t = ManagedTable(spark, tmp() + "/td")
    t.overwriteAll(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    val d = t.detail()
    d.version shouldBe t.currentVersion.get
    d.numFiles shouldBe t.manifest.get.files.size.toLong
    d.rows shouldBe Some(3L)
    d.sizeBytes should be > 0L
    d.partitionColumns shouldBe Nil
    d.operation shouldBe "append"
  }

  test("fastCount: metadata-only count; unknown after import, backfilled by stats") {
    val t = ManagedTable(spark, tmp() + "/tfc")
    t.overwriteAll(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.fastCount shouldBe Some(3L)
    t.fastCount shouldBe Some(t.read().count())

    // adopt a file WITHOUT a row count -> fastCount abstains (never guesses)
    val m = t.manifest.get
    val dataFile = m.files.head
    t.importFiles(m.schema, Nil,
      Seq(TableFile(dataFile.path, Map.empty, dataFile.stats)))
    t.fastCount shouldBe None

    // footer backfill restores the metadata answer
    t.collectStatistics()
    t.fastCount shouldBe Some(t.read().count())
  }

  test("type widening: wider appends widen the schema, narrower ones up-cast") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val t = ManagedTable(spark, tmp() + "/tw")
    t.overwriteAll(Seq((1, 1.5f)).toDF("id", "f")) // int, float
    t.append(Seq((2L, 2.5)).toDF("id", "f"))       // long, double -> widens
    t.manifest.get.schema("id").dataType shouldBe LongType
    t.manifest.get.schema("f").dataType shouldBe DoubleType
    val out = t.read().orderBy("id").collect()
    out.map(_.getLong(0)) shouldBe Array(1L, 2L) // old int32 file read as long
    out.map(_.getDouble(1)) shouldBe Array(1.5, 2.5)

    // a NARROWER source up-casts on write; the schema stays wide
    t.append(Seq((3, 3.5f)).toDF("id", "f"))
    t.manifest.get.schema("id").dataType shouldBe LongType
    t.read().count() shouldBe 3

    // non-widening retype still fails at write time
    a[graft.metadata.MetadataException] should be thrownBy
      t.append(Seq(("x", "y")).toDF("id", "f"))
  }

  test("vacuum: time travel below the horizon fails fast, current stays readable") {
    val t = ManagedTable(spark, tmp() + "/tv")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    val cur = t.currentVersion.get
    t.vacuum()
    t.earliestReadableVersion shouldBe Some(cur)
    // vacuumed version: clear MetadataException, not a FileNotFound mid-scan
    val ex = intercept[graft.metadata.MetadataException](t.readVersion(cur - 1))
    ex.getMessage should include("vacuumed")
    // current version still fully readable after vacuum
    t.readVersion(cur).count() shouldBe 3
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
    // and new commits after the vacuum time-travel normally
    t.append(Seq((4, "d")).toDF("id", "v"))
    t.readVersion(cur).count() shouldBe 3
    t.read().count() shouldBe 4
  }

  test("vacuum deletes many commit dirs through the pool, table stays intact") {
    // 20+ dead versions exercise the parallel-delete path (pool engages
    // above 2 items); every dead dir and record must be gone, the
    // current snapshot untouched
    val t = ManagedTable(spark, tmp() + "/tp")
    t.overwriteAll(Seq((0, "seed")).toDF("id", "v"))
    (1 to 24).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v")))
    val cur = t.currentVersion.get
    t.vacuum()
    t.earliestReadableVersion shouldBe Some(cur)
    t.read().collect().map(_.getInt(0)).sorted shouldBe (0 to 24).toArray
    // failing pool tasks surface, not vanish: a later vacuum after more
    // commits still works (pool is per-call, not shared state)
    (25 to 28).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v")))
    t.vacuum()
    t.read().count() shouldBe 29
  }

  test("vacuum distributed-delete path (threshold 1) removes everything dead") {
    spark.conf.set("spark.graft.vacuum.distributedThreshold", "1")
    try {
      val t = ManagedTable(spark, tmp() + "/tdist")
      t.overwriteAll(Seq((0, "seed")).toDF("id", "v"))
      t.addBloomIndex("id") // bloom sidecars ride the distributed path too
      (1 to 8).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v")))
      val cur = t.currentVersion.get
      t.vacuum()
      t.earliestReadableVersion shouldBe Some(cur)
      t.read().collect().map(_.getInt(0)).sorted shouldBe (0 to 8).toArray
      // bloom lookups still work after sidecar cleanup
      t.readEquals("id", Seq(3)).count() shouldBe 1
    } finally spark.conf.unset("spark.graft.vacuum.distributedThreshold")
  }

  test("vacuum is serialized with concurrent writers (no lost commits)") {
    // vacuum races an appender on the SAME table: without the write lock it
    // can observe the pre-commit manifest and delete the appender's
    // freshly-written, not-yet-published commit directory. Under the lock,
    // every appended row must survive and stay readable.
    val t = ManagedTable(spark, tmp() + "/tc")
    t.overwriteAll(Seq((0, "seed")).toDF("id", "v"))
    val appends = 8
    val writer = new Thread(() =>
      (1 to appends).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v"))))
    writer.start()
    (1 to appends).foreach { _ => t.vacuum() }
    writer.join()
    t.vacuum()
    t.read().collect().map(_.getInt(0)).sorted shouldBe (0 to appends).toArray
  }

  test("append adopts NEW source columns; existing files read them as null") {
    val t = ManagedTable(spark, tmp() + "/td")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b", "extra")).toDF("id", "v", "note"))
    t.manifest.get.schema.fieldNames should contain("note")
    val rows = t.read().orderBy("id").collect()
    rows(0).isNullAt(rows(0).fieldIndex("note")) shouldBe true
    rows(1).getString(rows(1).fieldIndex("note")) shouldBe "extra"
  }

  test("jdbc metadata loader reads config from a database") {
    val url = "jdbc:derby:memory:graftmeta;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE cfg (config VARCHAR(4000))")
    st.execute("""INSERT INTO cfg VALUES ('{
      "environment": { "name": "fromdb", "root_folder": "/data" },
      "connections": [ { "name": "c1" } ],
      "entities": [ { "id": 5, "name": "dbent", "connection": "c1" } ] }')""")
    conn.close()

    val md = Metadata.fromJdbc(spark, url, "SELECT config FROM cfg")
    md.environment.name shouldBe "fromdb"
    md.getEntity(5).name shouldBe "dbent"
  }

  test("data skipping: manifest stats prune files outside the range") {
    import org.apache.spark.sql.functions.col
    val t = ManagedTable(spark, tmp() + "/skip")
    // range-partitioned write → each file covers a disjoint seq range
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("seq", "v")
      .repartitionByRange(4, col("seq"))
    t.overwriteAll(df)
    val files = t.manifest.get.files
    files.size shouldBe 4
    // every file carries long stats for seq and string stats for v
    files.foreach { f =>
      f.stats("seq").typ shouldBe "long"
      f.stats("v").typ shouldBe "string"
    }
    // a 50-wide range inside one quartile keeps exactly one file
    t.filesInRange("seq", Some(300L), Some(320L)).size shouldBe 1
    // open-ended ranges work
    t.filesInRange("seq", Some(900L), None).size shouldBe 1
    t.filesInRange("seq", None, None).size shouldBe 4
    // unknown column: conservatively keeps everything
    t.filesInRange("nope", Some(1), Some(2)).size shouldBe 4
    // result equals a full-scan filter
    t.readRange("seq", Some(300L), Some(320L))
      .collect().map(_.getLong(0)).sorted shouldBe (300L to 320L).toArray
  }

  test("parquet checkpoint sidecar: large checkpoints round-trip off-JSON") {
    import org.apache.spark.sql.functions.col
    val root = tmp() + "/sidecar"
    val t = ManagedTable(spark, root)
    spark.conf.set("spark.graft.manifest.parquetCheckpointThreshold", "4")
    try {
      val df = (1 to 300).map(i => (i.toLong, s"v$i", (i % 3).toString))
        .toDF("id", "v", "p").repartitionByRange(4, col("id"))
      t.overwriteAll(df, Seq("p"))                       // ≥4 files → sidecar
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def record(v: Long): String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(
          root, f"_graft/manifests/v$v%020d.json"))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      record(0) should include("filesRef")
      record(0) should not include "\"files\""
      fs.exists(new org.apache.hadoop.fs.Path(root,
        f"_graft/manifests/v${0L}%020d${ManagedTable.SidecarSuffix}")) shouldBe true

      // a FRESH instance (cold snapshot cache) reconstructs through the
      // sidecar: data, partition values, and file stats all survive
      val t2 = ManagedTable(spark, root)
      t2.read().count() shouldBe 300
      val m = t2.manifest.get
      m.files.foreach { f =>
        f.partitionValues.keySet should contain("p")
        f.stats.keySet should contain("id")
      }
      t2.readPartitionsIn(Map("p" -> Set("1"))).count() shouldBe 100
      t2.filesInRange("id", Some(1L), Some(5L)).size should be < m.files.size

      // small append stays an O(delta) JSON record on top of the sidecar base
      t2.append(Seq((1000L, "x", "1")).toDF("id", "v", "p"))
      record(1) should include("baseVersion")
      ManagedTable(spark, root).read().count() shouldBe 301

      // vacuum drops unreferenced sidecars, keeps the chain's base —
      // and the dry run enumerates the sidecar blast radius up front
      t2.overwriteAll(df, Seq("p"))                      // v2, new sidecar
      val plan = t2.vacuumDryRun()
      plan.recordVersions shouldBe Seq(0L, 1L)
      plan.checkpointSidecarVersions shouldBe Seq(0L)
      t2.vacuum()
      fs.exists(new org.apache.hadoop.fs.Path(root,
        f"_graft/manifests/v${0L}%020d${ManagedTable.SidecarSuffix}")) shouldBe false
      fs.exists(new org.apache.hadoop.fs.Path(root,
        f"_graft/manifests/v${2L}%020d${ManagedTable.SidecarSuffix}")) shouldBe true
      ManagedTable(spark, root).read().count() shouldBe 300
    } finally spark.conf.unset("spark.graft.manifest.parquetCheckpointThreshold")
  }

  test("zorder: range skipping works on BOTH clustered columns") {
    import org.apache.spark.sql.functions.{col, hash, pmod}
    val t = ManagedTable(spark, tmp() + "/zorder")
    // 64×64 grid in a hash-shuffled row order: before z-ordering, every
    // file sees the full range of both x and y
    val grid = (0 until 4096).map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
      .repartition(8, pmod(hash(col("id")), org.apache.spark.sql.functions.lit(8)))
    t.overwriteAll(grid)
    t.filesInRange("x", Some(0L), Some(7L)).size shouldBe t.manifest.get.files.size
    t.filesInRange("y", Some(0L), Some(7L)).size shouldBe t.manifest.get.files.size

    t.zorder(Seq("x", "y"), targetFiles = 16)
    val total = t.manifest.get.files.size
    total should be >= 8
    // a 1/8-wide range on EITHER column now skips most files — the
    // property a linear sort cannot deliver for its trailing column
    t.filesInRange("x", Some(0L), Some(7L)).size.toDouble should be <= total / 2.0
    t.filesInRange("y", Some(0L), Some(7L)).size.toDouble should be <= total / 2.0
    // the rewrite is a reorder, not a change
    t.read().count() shouldBe 4096
    t.readRange("x", Some(3L), Some(3L)).collect()
      .map(_.getLong(0)).sorted shouldBe
      (0 until 4096).filter(_ % 64 == 3).map(_.toLong).toArray
    // rejects types without a range order
    val s = ManagedTable(spark, tmp() + "/zstr")
    s.overwriteAll(Seq((1L, Array[Byte](1))).toDF("id", "blob"))
    intercept[graft.metadata.MetadataException](s.zorder(Seq("blob")))
  }

  test("history lists retained commits newest-first with operations") {
    val t = ManagedTable(spark, tmp() + "/hist")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.restore(0)
    val h = t.history()
    h.map(_.version) shouldBe Seq(2L, 1L, 0L)
    h.map(_.operation) shouldBe Seq("restore(0)", "append", "overwrite")
    h.head.checkpoint shouldBe true  // restore replaced every file → full record
    h(1).checkpoint shouldBe false   // small append rode an incremental delta
  }

  test("restore: rolls back to an old version as a new commit, no data copy") {
    val t = ManagedTable(spark, tmp() + "/restore")
    t.overwriteAll(Seq((1, "a"), (2, "b")).toDF("id", "v"))      // v0
    t.append(Seq((3, "c")).toDF("id", "v"))                      // v1
    t.overwriteAll(Seq((9, "z")).toDF("id", "v"))                // v2
    t.restore(0)                                                 // v3 == v0
    t.currentVersion shouldBe Some(3L)
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    // history above the restore point is still intact
    t.readVersion(1).collect().map(_.getInt(0)).sorted shouldBe Array(1, 2, 3)
    t.readVersion(2).collect().map(_.getInt(0)).sorted shouldBe Array(9)
    // roll FORWARD again to the pre-restore state
    t.restore(2)
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(9)
    // restore below the vacuum horizon fails fast
    t.vacuum()
    intercept[graft.metadata.MetadataException](t.restore(0))
  }

  test("distributed footer stats equal driver-side stats") {
    val dir = tmp() + "/stats"
    (1 to 40).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "name", "score")
      .repartition(4).write.parquet(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val paths = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).toSeq
    paths.size should be >= 2
    val driverSide = paths.map(f =>
      f.toString -> FileStatistics.fromFooter(conf, f)).toMap
    val distributed = FileStatistics.collectDistributed(spark, conf, paths)
    distributed shouldBe driverSide
    // sanity: stats actually carry ranges and exact per-file row counts
    driverSide.values.flatMap(_.cols.get("id")).map(_.min.toLong).min shouldBe 1L
    driverSide.values.flatMap(_.cols.get("id")).map(_.max.toLong).max shouldBe 40L
    driverSide.values.map(_.rows).sum shouldBe 40L
  }

  test("collectStatistics backfills manifest files lacking stats") {
    val t = ManagedTable(spark, tmp() + "/bf")
    t.overwriteAll(Seq((1L, "a"), (9L, "b")).toDF("id", "v"))
    // simulate an imported/legacy manifest: strip the stats, re-commit
    val m = t.readManifest(t.currentVersion.get)
    val stripped = m.copy(version = m.version + 1,
      files = m.files.map(_.copy(stats = Map.empty)))
    val fs = new org.apache.hadoop.fs.Path(t.rootPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(
      t.rootPath, f"_graft/manifests/v${stripped.version}%020d.json")
    val out = fs.create(mp, true)
    out.write(stripped.toJsonString.getBytes("UTF-8")); out.close()
    val ptr = fs.create(new org.apache.hadoop.fs.Path(
      t.rootPath, "_graft/_current"), true)
    ptr.write(stripped.version.toString.getBytes("UTF-8")); ptr.close()
    t.manifest.get.files.forall(_.stats.isEmpty) shouldBe true

    t.collectStatistics()
    val after = t.manifest.get
    after.operation shouldBe "collectStatistics"
    after.files.forall(_.stats.nonEmpty) shouldBe true
    after.files.flatMap(_.stats.get("id")).map(_.min.toLong).min shouldBe 1L
    // idempotent: a second call commits nothing
    val v = t.currentVersion.get
    t.collectStatistics()
    t.currentVersion.get shouldBe v
  }

  test("commits write O(delta) incremental records; checkpoints bound the chain") {
    val t = ManagedTable(spark, tmp() + "/log")
    t.overwriteAll(Seq((0, "base")).toDF("id", "v"))          // v0 checkpoint
    (1 to 12).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "v")))
    t.currentVersion.get shouldBe 12L

    val fs = new org.apache.hadoop.fs.Path(t.rootPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def record(v: Long) = {
      val in = fs.open(new org.apache.hadoop.fs.Path(
        t.rootPath, f"_graft/manifests/v$v%020d.json"))
      try Manifest.recordFromJsonString(new String(in.readAllBytes(), "UTF-8"))
      finally in.close()
    }
    record(0).isLeft shouldBe true                       // initial checkpoint
    record(5).isRight shouldBe true                      // plain append: delta
    record(10).isLeft shouldBe true                      // interval checkpoint
    record(12).toOption.get.baseVersion shouldBe 11L     // chains off v11

    // a delta append carries only its own files
    record(7).toOption.get.adds.size should be < 4
    // reconstruction equals reality at every version
    (0 to 12).foreach { v =>
      ManagedTable(spark, t.rootPath).readVersion(v)
        .collect().map(_.getInt(0)).sorted shouldBe (0 to v).toArray
    }

    // vacuum keeps the chain current depends on (v10..v12), drops the rest
    t.vacuum()
    val left = fs.listStatus(new org.apache.hadoop.fs.Path(
      t.rootPath, "_graft/manifests")).map(_.getPath.getName).sorted
    left.map(_.stripPrefix("v").stripSuffix(".json").toLong).toSeq shouldBe
      Seq(10L, 11L, 12L)
    // current still reconstructs after vacuum, from a fresh instance
    ManagedTable(spark, t.rootPath).read()
      .collect().map(_.getInt(0)).sorted shouldBe (0 to 12).toArray
  }

  test("vacuum sweeps hour-old crashed-rename tmp files, keeps fresh ones") {
    import org.apache.hadoop.fs.Path
    val t = ManagedTable(spark, tmp() + "/tmpsweep")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    val fs = new Path(t.rootPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = new Path(t.rootPath, "_graft/_current.tmp.dead")
    val live = new Path(t.rootPath, "_graft/_current.tmp.live")
    Seq(dead, live).foreach { p =>
      val o = fs.create(p, true); o.write("x".getBytes("UTF-8")); o.close()
    }
    fs.setTimes(dead, System.currentTimeMillis() - 2 * 3600 * 1000L, -1)
    t.vacuum()
    fs.exists(dead) shouldBe false // crashed writer's leak reclaimed
    fs.exists(live) shouldBe true  // an in-flight writer's tmp survives
    t.read().count() shouldBe 1
  }

  test("fsck repair: dangling references dropped, intact files survive") {
    import org.apache.hadoop.fs.Path
    val t = ManagedTable(spark, tmp() + "/fsck")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v").coalesce(1))
    t.append(Seq((2, "b")).toDF("id", "v").coalesce(1))
    val fs = new Path(t.rootPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // delete one data file out-of-band — reads would now fail mid-scan
    val victim = t.manifest.get.files.head
    fs.delete(new Path(t.rootPath, victim.path), false)
    // dry run reports without committing
    t.repairTable(dryRun = true) shouldBe Seq(victim.path)
    t.manifest.get.files.size shouldBe 2
    // real repair drops the dangling entry; the table reads again
    t.repairTable() shouldBe Seq(victim.path)
    t.history().head.operation shouldBe "fsck"
    t.read().count() shouldBe 1
    // clean table: no-op, no commit
    val v = t.currentVersion.get
    t.repairTable() shouldBe empty
    t.currentVersion shouldBe Some(v)
  }

  test("crashed writes are invisible: stray data files never reach readers") {
    val t = ManagedTable(spark, tmp() + "/atomic")
    t.overwriteAll(Seq((1, "a")).toDF("id", "v"))
    // simulate a writer that died after producing files but before commit:
    // drop a parquet file into the data area with no manifest reference
    Seq((99, "ghost")).toDF("id", "v").coalesce(1)
      .write.parquet(t.rootPath + "/data/deadbeef-crashed-commit")
    t.read().collect().map(_.getInt(0)) shouldBe Array(1) // reader unaffected
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
    // vacuum clears the orphaned commit
    t.vacuum()
    t.read().collect().map(_.getInt(0)).sorted shouldBe Array(1, 2)
  }

  test("schema drift: new vs missing columns reported by name") {
    val src = Seq((1, "a", 2.0)).toDF("id", "name", "extra").schema
    val tgt = Seq((1, "a", true)).toDF("id", "name", "flag").schema
    val drift = SchemaDrift.compare(src, tgt)
    drift should contain(SchemaDrift.Drift("extra", SchemaDrift.NewColumn))
    drift should contain(SchemaDrift.Drift("flag", SchemaDrift.MissingColumn))
    SchemaDrift.compare(src, src) shouldBe empty
  }
}
