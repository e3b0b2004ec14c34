package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

import graft.tables.ManagedTable

class GraftDataSourceSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft-ds").toString

  test("format(\"graft\") write/read round-trip with save modes") {
    val p = tmp() + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("graft").save(p)
    spark.read.format("graft").load(p)
      .as[(Long, String)].collect().toSet shouldBe Set((1L, "a"), (2L, "b"))

    // append lands through the commit protocol (new version, all rows)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Append).save(p)
    spark.read.format("graft").load(p).count() shouldBe 3

    // overwrite replaces; ignore is a no-op on an existing table
    Seq((9L, "z")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Overwrite).save(p)
    Seq((8L, "y")).toDF("id", "v")
      .write.format("graft").mode(SaveMode.Ignore).save(p)
    spark.read.format("graft").load(p)
      .as[(Long, String)].collect().toSet shouldBe Set((9L, "z"))

    an[IllegalStateException] should be thrownBy
      Seq((7L, "x")).toDF("id", "v")
        .write.format("graft").mode(SaveMode.ErrorIfExists).save(p)
  }

  test("versionAsOf time travel and partitioned writes through the format") {
    val p = tmp() + "/t"
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "part")
      .write.format("graft").option("partitionBy", "part").save(p)
    Seq((3L, "c", "y")).toDF("id", "v", "part")
      .write.format("graft").mode(SaveMode.Append).save(p)

    spark.read.format("graft").option("versionAsOf", "0").load(p)
      .count() shouldBe 2
    spark.read.format("graft").load(p).count() shouldBe 3
    // the table is genuinely partitioned (manifest tracks values)
    ManagedTable(spark, p).manifest.get.files
      .forall(_.partitionValues.contains("part")) shouldBe true
  }

  test("pushed filters prune files via manifest stats; results stay exact") {
    val p = tmp() + "/t"
    // three files with disjoint id ranges → stats prune per file
    Seq.tabulate(30)(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartitionByRange(3, col("id"))
      .write.format("graft").save(p)
    ManagedTable(spark, p).manifest.get.files.size shouldBe 3

    val out = spark.read.format("graft").load(p)
      .filter(col("id") >= 25L).select("id")
    out.as[Long].collect().sorted shouldBe (25L to 29L).toArray
    // row-level filter is still in the plan (filters declared unhandled)
    out.queryExecution.executedPlan.toString should include("Filter")
  }

  test("pushed partition filters prune driver-side — other partitions' files never open") {
    val p = tmp() + "/t"
    Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")).toDF("id", "v", "part")
      .write.format("graft").option("partitionBy", "part").save(p)
    val t = ManagedTable(spark, p)
    // delete the OTHER partitions' data files underneath: a scan that
    // lists them now throws, so a passing filtered read proves the prune
    t.manifest.get.files.filter(_.partitionValues("part") != "x")
      .foreach(f => new java.io.File(p, f.path).delete() shouldBe true)
    spark.read.format("graft").load(p).filter(col("part") === "x")
      .select("id").as[Long].collect() shouldBe Array(1L)
    spark.read.format("graft").load(p).filter(col("part").isin("x"))
      .count() shouldBe 1
    // range comparison on the partition column prunes too
    spark.read.format("graft").load(p).filter(col("part") < "y")
      .count() shouldBe 1
    // and an unfiltered SCAN really does break (the files are gone).
    // Not count(): when the metadata-aggregate rule is injected, a bare
    // count answers from the manifest without opening any file —
    // by design (Delta's metadata-only count behaves the same).
    an[Exception] should be thrownBy
      spark.read.format("graft").load(p).select("id").collect()
  }

  test("pushed point lookups prune via bloom sidecars where min/max is blind") {
    val p = tmp() + "/t"
    // hash-distribute ids so every file's [min, max] spans the full range
    // — stats alone cannot skip; only the bloom probe can
    Seq.tabulate(300)(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(3, col("id"))
      .write.format("graft").save(p)
    val t = ManagedTable(spark, p)
    t.manifest.get.files.size shouldBe 3
    t.addBloomIndex("id")
    val hit = t.filesMightContain("id", Seq(42L)).map(_.path)
    hit.size should be < 3 // bloom really is selective here
    // delete every non-hit file: only a bloom-pruned scan can succeed
    t.manifest.get.files.filterNot(f => hit.contains(f.path))
      .foreach(f => new java.io.File(p, f.path).delete() shouldBe true)
    spark.read.format("graft").load(p).filter(col("id") === 42L)
      .select("v").as[String].collect() shouldBe Array("r42")
    spark.read.format("graft").load(p).filter(col("id").isin(42L))
      .count() shouldBe 1
  }

  test("one format string drives streaming source and sink too") {
    val base = tmp()
    val src = ManagedTable(spark, base + "/src")
    src.overwriteAll(Seq((1L, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft").load(base + "/src")
      .writeStream.format("graft")
      .option("path", base + "/dst")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    spark.read.format("graft").load(base + "/dst").count() shouldBe 1
  }

  test("batch readChangeFeed returns the classified changes of a version range") {
    val base = tmp()
    val src = ManagedTable(spark, base + "/src")
    src.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))   // v0
    src.append(Seq((3L, "c")).toDF("id", "v"))                    // v1
    src.delete("id = 2")                                          // v2

    val full = spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("changeFeedKeys", "id")
      .load(base + "/src")
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    full shouldBe Set(
      (1L, "insert", 0L), (2L, "insert", 0L),
      (3L, "insert", 1L), (2L, "delete", 2L))

    // bounded range: only v1's changes
    spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingVersion", "1").option("endingVersion", "1")
      .load(base + "/src")
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((3L, "insert"))

    intercept[IllegalArgumentException](spark.read.format("graft")
      .option("readChangeFeed", "true").option("changeFeedKeys", "id")
      .option("startingVersion", "5").load(base + "/src"))
  }

  test("batch readChangeFeed timestamp bounds resolve to versions") {
    val base = tmp()
    val src = ManagedTable(spark, base + "/src")
    src.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))   // v0
    Thread.sleep(5)
    src.append(Seq((3L, "c")).toDF("id", "v"))                    // v1
    val v1ts = src.history().find(_.version == 1L).get.timestampMs
    src.history().find(_.version == 0L).get.timestampMs should be < v1ts
    // starting = first commit at or after; ending = newest at or before
    spark.read.format("graft")
      .option("readChangeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingTimestamp", v1ts.toString)
      .option("endingTimestamp", v1ts.toString)
      .load(base + "/src")
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq shouldBe
      Seq((3L, "insert", 1L))
    // a timestamp twin never combines with its version form
    intercept[IllegalArgumentException](spark.read.format("graft")
      .option("readChangeFeed", "true").option("changeFeedKeys", "id")
      .option("startingVersion", "0")
      .option("startingTimestamp", v1ts.toString)
      .load(base + "/src"))
  }

  test("changeFeed option routes the short name to the CDC source") {
    val base = tmp()
    val src = ManagedTable(spark, base + "/src")
    src.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    src.delete("id = 2")
    val q = spark.readStream.format("graft")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingVersion", "0")
      .load(base + "/src")
      .writeStream.format("memory").queryName("gcdf")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    spark.table("gcdf").select("id", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet shouldBe Set(
        (1L, "insert", 0L), (2L, "insert", 0L), (2L, "delete", 1L))
  }

  test("manifest-priced sizeInBytes lets Catalyst auto-broadcast small tables") {
    val p = tmp() + "/dim"
    (1L to 100L).map(i => (i, s"d$i")).toDF("k", "d")
      .write.format("graft").save(p)
    val dim = spark.read.format("graft").load(p)
    // the relation reports its true on-disk size (a few KB), far under
    // the broadcast threshold
    val rel = dim.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }.get
    rel.sizeInBytes should be < 10L * 1024 * 1024
    val fact = spark.range(10000).toDF("k")
    val joined = fact.join(dim, "k")
    val planStr = joined.queryExecution.executedPlan.toString
    planStr should include("BroadcastHashJoin")
    joined.count() shouldBe 100L
  }

  test("DataFrameWriter.partitionBy reaches the manifest (V1 forwards it " +
      "as the __partition_columns option)") {
    val p = tmp() + "/pby"
    Seq((1L, 10), (2L, 20), (3L, 10)).toDF("id", "day")
      .write.format("graft").partitionBy("day").save(p)
    val t = ManagedTable(spark, p)
    t.manifest.map(_.partitionColumns) shouldBe Some(Seq("day"))
    // partition pruning works off the layout the writer declared
    spark.read.format("graft").load(p)
      .filter(col("day") === 10).count() shouldBe 2
    // appends inherit the table's partitioning
    Seq((4L, 30)).toDF("id", "day")
      .write.format("graft").mode(SaveMode.Append).save(p)
    ManagedTable(spark, p).manifest
      .map(_.partitionColumns) shouldBe Some(Seq("day"))
  }

  test("partitionOverwriteMode=dynamic replaces only the partitions in " +
      "the data") {
    val p = tmp() + "/dyn"
    Seq((1L, 10, "a"), (2L, 20, "b")).toDF("id", "day", "v")
      .write.format("graft").partitionBy("day").save(p)
    Seq((9L, 10, "z")).toDF("id", "day", "v")
      .write.format("graft").mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic").save(p)
    spark.read.format("graft").load(p).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1))) shouldBe
      Array((2L, 20), (9L, 10)) // day=20 untouched
    // without the option, overwrite stays a full replacement
    Seq((7L, 30, "w")).toDF("id", "day", "v")
      .write.format("graft").mode(SaveMode.Overwrite)
      .option("partitionBy", "day").save(p)
    spark.read.format("graft").load(p).count() shouldBe 1

    // the SESSION conf form must be honored too (Spark file sources and
    // Delta both do) — ignoring it was a silent full overwrite
    Seq((8L, 40, "x")).toDF("id", "day", "v")
      .write.format("graft").mode(SaveMode.Overwrite)
      .option("partitionBy", "day").save(p) // full overwrite: only day=40 remains
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((5L, 50, "y")).toDF("id", "day", "v")
        .write.format("graft").mode(SaveMode.Overwrite).save(p)
      spark.read.format("graft").load(p).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1))) shouldBe
        Array((5L, 50), (8L, 40)) // day=40 untouched under the conf
      // unpartitioned target + session conf: plain full overwrite, no error
      val up = tmp() + "/dynu"
      Seq((1L, "a")).toDF("id", "v").write.format("graft").save(up)
      Seq((2L, "b")).toDF("id", "v")
        .write.format("graft").mode(SaveMode.Overwrite).save(up)
      spark.read.format("graft").load(up).collect()
        .map(_.getLong(0)) shouldBe Array(2L)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("option(\"readRowIds\") exposes _row_id and _row_commit_version") {
    val p = tmp() + "/rt"
    (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
      .write.format("graft").save(p)
    val t = ManagedTable(spark, p)
    t.enableRowTracking()
    val df = spark.read.format("graft").option("readRowIds", "true").load(p)
    df.columns.toSeq shouldBe Seq("k", "v", "_row_id", "_row_commit_version")
    df.select("_row_id").distinct().count() shouldBe 50
    // snapshot-per-scan: a later append is visible with fresh IDs
    Seq((51L, "x")).toDF("k", "v")
      .write.format("graft").mode(SaveMode.Append).save(p)
    df.count() shouldBe 51
    intercept[IllegalArgumentException](
      spark.read.format("graft").option("readRowIds", "true")
        .option("versionAsOf", "0").load(p))
  }
}
