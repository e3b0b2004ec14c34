package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

class StreamOpsSpec extends AnyFunSuite with Matchers {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._
  import StreamOps._

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-10 10:$minute%02d:00")

  test("windowed counts with watermark finalize on a real stream") {
    val input = MemoryStream[Event](spark)
    val q = tumblingCounts(input.toDF(), "ts", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wins")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(
        Event(1, ts(1), "click"), Event(2, ts(2), "click"), Event(1, ts(3), "view"))
      q.processAllAvailable()
      // advance the watermark far past the first window → it finalizes
      input.addData(Event(9, ts(30), "click"))
      q.processAllAvailable()
      input.addData(Event(9, ts(45), "click"))
      q.processAllAvailable()

      val rows = spark.table("wins")
        .select("window_start", "event_type", "n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      rows should contain(Timestamp.valueOf("2024-01-10 10:00:00"), "click", 2L)
      rows should contain(Timestamp.valueOf("2024-01-10 10:00:00"), "view", 1L)
    } finally q.stop()
  }

  test("streaming dedup emits first arrival only; state bounded by watermark") {
    val input = MemoryStream[Event](spark)
    val q = StreamOps.streamingDedup(
        input.toDF(), "ts", Seq("event_type"), "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1, ts(1), "alpha"), Event(2, ts(2), "alpha"))
      q.processAllAvailable()
      // duplicate key in a LATER microbatch, still within the watermark
      input.addData(Event(3, ts(3), "alpha"), Event(4, ts(4), "beta"))
      q.processAllAvailable()
      val rows = spark.table("dedup")
        .select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      // first alpha (user 1) and first beta (user 4) only
      rows shouldBe Array((1L, "alpha"), (4L, "beta"))
    } finally q.stop()
  }

  test("sessionization emits final sessions after the gap times out") {
    val input = MemoryStream[Event](spark)
    val sessions = sessionize(input.toDS(), gapMs = 5 * 60 * 1000, "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // burst 1: user 7, minutes 1-3 (one session)
      input.addData(Event(7, ts(1), "a"), Event(7, ts(2), "b"), Event(7, ts(3), "c"))
      q.processAllAvailable()
      // much later event advances the watermark beyond burst1.last + gap
      input.addData(Event(8, ts(40), "z"))
      q.processAllAvailable()
      input.addData(Event(8, ts(55), "z"))
      q.processAllAvailable()

      val out = spark.table("sess").as[Session].collect()
      val s7 = out.filter(_.user_id == 7L)
      s7 should have length 1
      s7.head.session_start shouldBe ts(1)
      s7.head.session_end shouldBe ts(3)
      s7.head.n_events shouldBe 3L
    } finally q.stop()
  }

  test("table stream source: initial snapshot, then appended rows per version") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-tss").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))
    val stream = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .load()
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("tss")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      spark.table("tss").count() shouldBe 1 // the initial snapshot

      t.append(Seq((2L, "b")).toDF("id", "v"))
      q.processAllAvailable()
      val rows = spark.table("tss").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      rows shouldBe Array((1L, "a"), (2L, "b"))

      // two commits before the next poll arrive as one composed batch
      t.append(Seq((3L, "c")).toDF("id", "v"))
      t.append(Seq((4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
      spark.table("tss").count() shouldBe 4
    } finally q.stop()
  }

  test("table stream source: skipChangeCommits suppresses rewrite commits, " +
      "appends still flow") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-tscc").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val stream = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("skipChangeCommits", "true")
      .load()
    val q = stream.writeStream.format("memory").queryName("tscc")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      spark.table("tscc").count() shouldBe 2 // initial snapshot

      // UPDATE rewrites the file: a change commit — nothing re-emitted
      t.update(Map("v" -> "'B'"), "id = 2")
      q.processAllAvailable()
      spark.table("tscc").count() shouldBe 2

      // a pure append after the skipped commit still flows
      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      spark.table("tscc").collect().map(_.getLong(0)).sorted shouldBe
        Array(1L, 2L, 3L)

      // default behavior (no option) re-emits the rewritten file
      val q2 = spark.readStream
        .format(classOf[TableStreamProvider].getName)
        .option("path", dir + "/t")
        .load()
        .writeStream.format("memory").queryName("tscc_all")
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        q2.processAllAvailable()
        val before = spark.table("tscc_all").count() // snapshot: 3
        t.update(Map("v" -> "'A'"), "id = 1")
        q2.processAllAvailable()
        // the rewrite re-emitted its file's live rows
        spark.table("tscc_all").count() should be > before
      } finally q2.stop()
    } finally q.stop()
  }

  test("table stream source: startingVersion skips the snapshot; " +
      "latest streams only new commits; startingTimestamp anchors") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))   // v0
    t.append(Seq((2L, "b")).toDF("id", "v"))          // v1
    val t1 = t.history().find(_.version == 1L).get.timestampMs
    t.append(Seq((3L, "c")).toDF("id", "v"))          // v2

    def run(opts: (String, String)*)(body: ManagedTable => Unit): Seq[Long] = {
      val name = s"tsv${System.nanoTime() % 1000000}"
      var r = spark.readStream.format(classOf[TableStreamProvider].getName)
        .option("path", dir + "/t")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        q.processAllAvailable()
        body(t)
        q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
      } finally q.stop()
    }

    // startingVersion 0: every commit replayed, no snapshot semantics
    run("startingVersion" -> "0")(_ => ()) shouldBe Seq(1L, 2L, 3L)
    // startingVersion 2: only v2 onward
    run("startingVersion" -> "2")(_ => ()) shouldBe Seq(3L)
    // latest: nothing until a commit lands after stream start
    run("startingVersion" -> "latest")(
      _.append(Seq((4L, "d")).toDF("id", "v"))) shouldBe Seq(4L)
    // timestamp anchored at v1's commit instant: v1 onward
    run("startingTimestamp" -> t1.toString)(_ => ()) shouldBe
      Seq(2L, 3L, 4L)
  }

  test("table stream source: startingVersion at the vacuum horizon " +
      "replays that version from its own record") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-tsh").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))   // v0
    t.append(Seq((2L, "b")).toDF("id", "v"))          // v1
    t.append(Seq((3L, "c")).toDF("id", "v"))          // v2
    t.vacuum() // prunes pre-horizon manifests — the natural state after
               // retention; startingVersion=horizon is the natural option
    val hz = t.earliestReadableVersion.get
    hz should be > 0L

    def run(sv: Long)(body: => Unit): Seq[Long] = {
      val name = s"tsh${System.nanoTime() % 1000000}"
      val q = spark.readStream.format(classOf[TableStreamProvider].getName)
        .option("path", dir + "/t").option("startingVersion", sv.toString)
        .load().writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
      try {
        q.processAllAvailable(); body; q.processAllAvailable()
        spark.table(name).collect().map(_.getLong(0)).sorted.toSeq
      } finally q.stop()
    }

    // horizon start: version hz replays from its own record (the full
    // retained state — its predecessor's manifest no longer exists),
    // later commits flow normally
    run(hz)(t.append(Seq((4L, "d")).toDF("id", "v"))) shouldBe
      Seq(1L, 2L, 3L, 4L)
    // below the horizon still fails loudly (data genuinely vacuumed)
    val e = intercept[Exception](run(hz - 1)(()))
    e.getMessage should include("vacuum")
  }

  test("table stream source: startingVersion restart resumes from the " +
      "checkpoint, no snapshot and no re-emission") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-tsvr").toString
    val t = ManagedTable(spark, base + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    def start() = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", base + "/t")
      .option("startingVersion", "1")
      .load()
      .writeStream.format("parquet")
      .option("path", base + "/out")
      .option("checkpointLocation", base + "/cp")
      .trigger(Trigger.ProcessingTime(0)).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    spark.read.parquet(base + "/out").collect()
      .map(_.getLong(0)) shouldBe Array(2L)
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the checkpoint resumes past v1: across both incarnations the
    // snapshot never arrives and nothing re-emits
    spark.read.parquet(base + "/out").collect()
      .map(_.getLong(0)).sorted shouldBe Array(2L, 3L)
  }

  test("table stream source: checkpoint restart resumes, no re-emission") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-tsr").toString
    val t = ManagedTable(spark, base + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))
    def start() = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", base + "/t").load()
      .writeStream.format("parquet")
      .option("path", base + "/out")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    t.append(Seq((2L, "b")).toDF("id", "v"))
    // restart against the SAME checkpoint: the bookmarked version offset
    // (a SerializedOffset on restore) must resume AFTER the snapshot —
    // row 1 arrives exactly once across both incarnations
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(base + "/out").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    out shouldBe Array((1L, "a"), (2L, "b"))
  }

  test("table stream sink: exactly-once appends, replayed batch ignored") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-tsk").toString

    // end-to-end: a real stream lands in a managed table
    val input = MemoryStream[Event](spark)
    val q = input.toDF().writeStream
      .format(classOf[TableSinkProvider].getName)
      .option("path", base + "/t")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData(Event(1, ts(1), "a"), Event(2, ts(2), "b"))
      q.processAllAvailable()
      val t = ManagedTable(spark, base + "/t")
      t.read().count() shouldBe 2
      input.addData(Event(3, ts(3), "c"))
      q.processAllAvailable()
      t.read().count() shouldBe 3
      t.history().head.operation should startWith("streamBatch=")
    } finally q.stop()

    // replay semantics: re-delivering an already-committed batch id under
    // the SAME writer identity (same checkpointLocation) is a no-op
    val t = ManagedTable(spark, base + "/t")
    val sink = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckpt")))
    val v = t.currentVersion.get
    val replay = Seq(Event(9, ts(9), "dup")).toDF()
    sink.addBatch(0, replay) // id 0 already committed by the query above
    t.currentVersion.get shouldBe v
    t.read().count() shouldBe 3
    sink.addBatch(99, replay) // genuinely new batch id appends
    t.read().count() shouldBe 4
  }

  test("table stream sink: a fresh checkpoint writing into an existing table loses nothing") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-tsk2").toString
    val t = ManagedTable(spark, base + "/t")

    // writer A lands batches 0..1
    val sinkA = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckptA")))
    sinkA.addBatch(0, Seq(Event(1, ts(1), "a")).toDF())
    sinkA.addBatch(1, Seq(Event(2, ts(2), "b")).toDF())
    t.read().count() shouldBe 2

    // a NEW query (different checkpoint) restarts batchIds at 0 — its
    // early batches must NOT be suppressed by writer A's history
    val sinkB = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckptB")))
    sinkB.addBatch(0, Seq(Event(3, ts(3), "c")).toDF())
    sinkB.addBatch(1, Seq(Event(4, ts(4), "d")).toDF())
    t.read().count() shouldBe 4

    // each identity still suppresses ITS OWN replays
    val sinkA2 = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckptA")))
    sinkA2.addBatch(1, Seq(Event(9, ts(9), "dup")).toDF())
    t.read().count() shouldBe 4
  }

  test("table stream sink: crash before marker + vacuum + restart does not double-append") {
    import graft.tables.{ManagedTable, Txn}
    val base = java.nio.file.Files.createTempDirectory("graft-tsk3").toString
    val ckpt = base + "/ckpt"
    val t = ManagedTable(spark, base + "/t")
    val appId = {
      val sink = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
        Map("checkpointLocation" -> ckpt))
      sink.addBatch(0, Seq(Event(1, ts(1), "a")).toDF())
      sink.appId
    }

    // crash window: batch 1's data commit lands (txn embedded in the
    // record) but the process dies before setTxn writes the marker
    t.append(Seq(Event(2, ts(2), "b")).toDF(), "streamBatch=1",
      Some(Txn(appId, 1L)))
    t.getTxn(appId) shouldBe Some(0L) // marker still trails

    // maintenance buries and prunes the record that carried the txn
    (0 until 12).foreach(i =>
      t.append(Seq(Event(100L + i, ts(30), "m")).toDF(), "maintenance"))
    t.vacuum()
    // vacuum rolled the embedded txn forward into the vacuum-exempt marker
    t.getTxn(appId) shouldBe Some(1L)

    // restart: checkpoint redelivers batch 1 — it must NOT append twice
    val rows = t.read().count()
    val restarted = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> ckpt))
    restarted.addBatch(1, Seq(Event(2, ts(2), "b")).toDF())
    t.read().count() shouldBe rows
    restarted.addBatch(2, Seq(Event(3, ts(3), "c")).toDF()) // next batch lands
    t.read().count() shouldBe rows + 1
  }

  test("table stream sink: replay probe is O(1) per addBatch over a many-version table") {
    import graft.tables.ManagedTable
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-tsk4").toString
    val t = ManagedTable(spark, base + "/t")
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    // ~300 metadata-only commits: a long-lived table's version history
    t.importFiles(schema, Nil, Nil, "seed")
    (0 until 300).foreach(i => t.importFiles(schema, Nil, Nil, s"imp$i"))

    val sink = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckpt")))
    // first addBatch pays the one-time recovery walk (O(retained records))
    sink.addBatch(0, Seq(Event(1, ts(1), "a")).toDF())
    val after0 = sink.table.recordReadCount.get()
    // steady state: each subsequent addBatch must read O(1) records —
    // the in-memory lastCommitted makes the probe free; the commit itself
    // touches at most the base record of an uncached chain
    (1L to 4L).foreach { b =>
      sink.addBatch(b, Seq(Event(b, ts(b.toInt), "x")).toDF())
    }
    val perBatch = (sink.table.recordReadCount.get() - after0) / 4.0
    perBatch should be <= 2.0
  }

  test("table stream source: a mid-version offset whose predecessor was " +
      "vacuumed fails loudly instead of slicing the swapped snapshot list") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-midvac").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v").coalesce(1))        // v0
    val schema = t.manifest.get.schema
    def mkSource(maxFiles: String) = new TableStreamSource(spark.sqlContext,
      dir + "/t", schema,
      if (maxFiles.isEmpty) Map.empty
      else Map("maxFilesPerTrigger" -> maxFiles))

    // drain the v0 snapshot first, THEN commit v1 so its 3 files arrive
    // as a manifest-diff list the stream can stop inside
    val src = mkSource("1")
    val o0 = GraftSourceOffset.of(
      src.latestOffset(null, src.getDefaultReadLimit))   // snapshot (1 file)
    o0.isInitial shouldBe true
    t.append((2L to 4L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartitionByRange(3, $"id"))                                   // v1
    val mid = GraftSourceOffset.of(
      src.latestOffset(o0, src.getDefaultReadLimit))     // 1 of v1's 3 files
    mid.version shouldBe 1L
    mid.isInitial shouldBe false
    mid.fullyEmitted shouldBe false
    mid.listSize shouldBe Some(3L)

    // vacuum to the head: v0's manifest is gone, v1's diff list is no
    // longer derivable — listFor(v1) would silently become the 4-file
    // full snapshot and the mid-list index would slice the wrong list
    t.vacuum() // retainVersions 0: only the head survives
    t.earliestReadableVersion shouldBe Some(1L)
    val e = intercept[Exception] {
      mkSource("1").latestOffset(mid, src.getDefaultReadLimit)
    }
    e.getMessage should include("no longer the one")

    // a FULLY-EMITTED offset at the same version resumes safely: the
    // swapped list is never sliced, and new commits flow
    val done = GraftSourceOffset(1L, 2L, isInitial = false, Some(3L))
    done.fullyEmitted shouldBe true
    val src2 = mkSource("")
    val idle = src2.latestOffset(done, src2.getDefaultReadLimit)
    Option(idle).map(GraftSourceOffset.of).foreach { o =>
      // no new data: nothing beyond v1 may be offered
      src2.batchFrame(Some(done), o).count() shouldBe 0L
    }
    t.append(Seq((9L, "z")).toDF("id", "v").coalesce(1))              // v2
    val o2 = GraftSourceOffset.of(
      src2.latestOffset(done, src2.getDefaultReadLimit))
    src2.batchFrame(Some(done), o2).select("id").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(9L)
  }

  test("admission offset walk: exactly-once under random commits, limits, and restarts") {
    // simulates the engine's driver loop (latestOffset → getBatch →
    // checkpoint) over randomized commit shapes, per-trigger limits, and
    // source restarts at arbitrary points — every row must arrive
    // exactly once, the invariant the offset arithmetic exists for
    import graft.tables.ManagedTable
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
    val t = ManagedTable(spark, dir + "/t")
    var nextId = 0L
    def commit(n: Int, first: Boolean): Unit = {
      val rows = (0 until n).map { _ => nextId += 1; (nextId, s"r$nextId") }
      val d = rows.toDF("id", "v").repartitionByRange(n, $"id")
      if (first) t.overwriteAll(d) else t.append(d)
    }
    commit(4, first = true) // initial snapshot: 4 files
    (0 until 3).foreach(_ => commit(1 + rnd.nextInt(3), first = false))

    val schema = t.manifest.get.schema
    def mkSource(maxFiles: Int) = new TableStreamSource(spark.sqlContext,
      dir + "/t", schema, Map("maxFilesPerTrigger" -> maxFiles.toString))

    var src = mkSource(1 + rnd.nextInt(3))
    var start: Option[GraftSourceOffset] = None
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var idle = 0
    var steps = 0
    while (idle < 2 && steps < 60) {
      steps += 1
      val res = src.latestOffset(start.orNull, src.getDefaultReadLimit)
      val end = Option(res).map(GraftSourceOffset.of)
      if (end.isEmpty || end == start) {
        idle += 1
        // trickle in late commits on idle ticks — the walk must pick
        // them up from the checkpointed position (bounded for runtime)
        if (idle == 1 && nextId < 15) commit(1 + rnd.nextInt(2), first = false)
      } else {
        idle = 0
        seen ++= src.batchFrame(start, end.get)
          .select("id").collect().map(_.getLong(0))
        start = end // "checkpoint"
        // random restart: a fresh source instance with a fresh limit must
        // continue from the checkpointed offset alone
        if (rnd.nextBoolean()) src = mkSource(1 + rnd.nextInt(3))
      }
    }
    seen.sorted.toSeq shouldBe (1L to nextId).toSeq // exactly once, complete
  }

  test("two concurrent stream sinks with distinct identities land all batches exactly once") {
    import graft.tables.ManagedTable
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = java.nio.file.Files.createTempDirectory("graft-2sink").toString
    def sinkFor(ckpt: String) = new TableStreamSink(spark.sqlContext,
      base + "/t", Nil, Map("checkpointLocation" -> ckpt))

    // two writers interleave appends under the table's write lock; each
    // tracks its own batch sequence
    val fa = Future {
      val s = sinkFor(base + "/ckptA")
      (0L to 3L).foreach(b => s.addBatch(b, Seq(Event(100 + b, ts(1), "A")).toDF()))
    }
    val fb = Future {
      val s = sinkFor(base + "/ckptB")
      (0L to 3L).foreach(b => s.addBatch(b, Seq(Event(200 + b, ts(2), "B")).toDF()))
    }
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)

    val t = ManagedTable(spark, base + "/t")
    t.read().count() shouldBe 8
    // replays remain per-identity after the interleaving
    val ra = sinkFor(base + "/ckptA")
    ra.addBatch(3, Seq(Event(999, ts(9), "dup")).toDF())
    t.read().count() shouldBe 8
    ra.addBatch(4, Seq(Event(104, ts(1), "A")).toDF())
    t.read().count() shouldBe 9
  }

  test("upsert sink: per-key merge with deletes, sequence collapse, and idempotent replay") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val params = Map("checkpointLocation" -> (base + "/ckpt"),
      "mergeKey" -> "id", "deleteColumn" -> "deleted", "sequenceColumn" -> "seq")
    def mkSink = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      params, TableStreamSink.UpsertMode)
    val s = mkSink
    // batch 0 creates the table: key 3 arrives twice (seq 2 wins), key 9
    // is delete-only (a delete for a never-seen key is a no-op)
    s.addBatch(0, Seq((1L, "a", 1L, false), (2L, "b", 1L, false),
      (3L, "c0", 1L, false), (3L, "c", 2L, false), (9L, "x", 1L, true))
      .toDF("id", "v", "seq", "deleted"))
    val t = ManagedTable(spark, base + "/t")
    def state() = t.read().select("id", "v")
      .as[(Long, String)].collect().toSet
    state() shouldBe Set((1L, "a"), (2L, "b"), (3L, "c"))
    // batch 1: update key 1, delete key 2, insert key 4
    s.addBatch(1, Seq((1L, "a2", 3L, false), (2L, "b", 3L, true),
      (4L, "d", 3L, false)).toDF("id", "v", "seq", "deleted"))
    state() shouldBe Set((1L, "a2"), (3L, "c"), (4L, "d"))
    // replay on the same instance is ignored
    s.addBatch(1, Seq((1L, "ZZZ", 9L, false)).toDF("id", "v", "seq", "deleted"))
    state() shouldBe Set((1L, "a2"), (3L, "c"), (4L, "d"))
    // restart: a fresh instance recovers this identity's last batch from
    // the txn marker/embedded record and still suppresses the replay
    val s2 = mkSink
    s2.addBatch(1, Seq((1L, "ZZZ", 9L, false)).toDF("id", "v", "seq", "deleted"))
    state() shouldBe Set((1L, "a2"), (3L, "c"), (4L, "d"))
    // and the next live batch proceeds normally
    s2.addBatch(2, Seq((5L, "e", 4L, false)).toDF("id", "v", "seq", "deleted"))
    state() shouldBe Set((1L, "a2"), (3L, "c"), (4L, "d"), (5L, "e"))
  }

  test("upsert sink with mergeSchema adopts new CDC columns mid-stream") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-evo").toString
    val params = Map("checkpointLocation" -> (base + "/ckpt"),
      "mergeKey" -> "id", "deleteColumn" -> "deleted", "mergeSchema" -> "true")
    val s = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      params, TableStreamSink.UpsertMode)
    s.addBatch(0, Seq((1L, "a", false), (2L, "b", false))
      .toDF("id", "v", "deleted"))
    // batch 1 brings a new column; the delete flag itself is never adopted
    s.addBatch(1, Seq((2L, "b2", Some(7L), false), (3L, "c", Some(9L), false))
      .toDF("id", "v", "score", "deleted"))
    val t = ManagedTable(spark, base + "/t")
    t.read().columns.sorted shouldBe Array("id", "score", "v")
    t.read().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))) shouldBe
      Array((1L, "a", None), (2L, "b2", Some(7L)), (3L, "c", Some(9L)))
  }

  test("complete sink: each batch atomically replaces the table; replay ignored") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-complete").toString
    val params = Map("checkpointLocation" -> (base + "/ckpt"))
    def mkSink = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      params, TableStreamSink.CompleteMode)
    val s = mkSink
    s.addBatch(0, Seq((1L, 10L)).toDF("k", "n"))
    val t = ManagedTable(spark, base + "/t")
    t.read().count() shouldBe 1
    s.addBatch(1, Seq((1L, 11L), (2L, 5L)).toDF("k", "n"))
    t.read().as[(Long, Long)].collect().toSet shouldBe Set((1L, 11L), (2L, 5L))
    // restarted query re-delivers batch 1 — the overwrite must NOT run
    mkSink.addBatch(1, Seq((9L, 9L)).toDF("k", "n"))
    t.read().as[(Long, Long)].collect().toSet shouldBe Set((1L, 11L), (2L, 5L))
  }

  test("append sink auto-compaction bounds small-file growth") {
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-autoc").toString
    val s = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckpt"), "autoCompact" -> "true",
        "autoCompact.interval" -> "4",
        "autoCompact.smallBytes" -> (64L << 20).toString))
    (0L to 7L).foreach { b =>
      s.addBatch(b, Seq((b, s"row$b")).toDF("id", "v"))
    }
    val t = ManagedTable(spark, base + "/t")
    t.read().count() shouldBe 8 // maintenance never loses data
    // batch 4's compaction packed batches 0-4 into one file; 5-7 appended
    val files = t.manifest.get.files.size
    files should be <= 4
    t.history().map(_.operation) should contain("compactSmall")
    // replay detection survives interleaved no-txn maintenance commits
    val s2 = new TableStreamSink(spark.sqlContext, base + "/t", Nil,
      Map("checkpointLocation" -> (base + "/ckpt")))
    s2.addBatch(7, Seq((99L, "dup")).toDF("id", "v"))
    t.read().count() shouldBe 8
  }

  test("table-to-table streaming CDC pipeline: source admission + upsert sink end-to-end") {
    // the full composition through MicroBatchExecution: a managed table
    // as CDC source (bounded batches) replicated into a downstream
    // managed table via the upsert sink, across two AvailableNow runs
    // sharing one checkpoint — the silver→gold replication shape
    import graft.tables.ManagedTable
    val base = java.nio.file.Files.createTempDirectory("graft-t2t").toString
    val src = ManagedTable(spark, base + "/src")
    src.overwriteAll(Seq((1L, "a", 1L, false), (2L, "b", 1L, false))
      .toDF("id", "v", "seq", "deleted"))

    def run(): Unit = {
      val q = spark.readStream
        .format(classOf[TableStreamProvider].getName)
        .option("path", base + "/src")
        .option("maxFilesPerTrigger", "1")
        .load()
        .writeStream
        .format(classOf[TableSinkProvider].getName)
        .option("path", base + "/dst")
        .option("checkpointLocation", base + "/ckpt")
        .option("mode", "upsert").option("mergeKey", "id")
        .option("deleteColumn", "deleted").option("sequenceColumn", "seq")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "stream did not drain in time")
    }
    run()
    val dst = ManagedTable(spark, base + "/dst")
    def state() = dst.read().select("id", "v")
      .as[(Long, String)].collect().toSet
    state() shouldBe Set((1L, "a"), (2L, "b"))

    // CDC batch upstream: update key 1, delete key 2, insert key 3 —
    // the second run resumes from the shared checkpoint and applies
    // only the new commit
    src.append(Seq((1L, "a2", 2L, false), (2L, "b", 2L, true),
      (3L, "c", 2L, false)).toDF("id", "v", "seq", "deleted"))
    run()
    state() shouldBe Set((1L, "a2"), (3L, "c"))

    // a third run with nothing new upstream must change nothing
    run()
    state() shouldBe Set((1L, "a2"), (3L, "c"))
  }

  test("sink mode resolution: explicit option wins, output mode implies, bad combos rejected") {
    import org.apache.spark.sql.streaming.OutputMode
    import TableStreamSink._
    resolveMode(Map.empty, OutputMode.Append()) shouldBe AppendMode
    resolveMode(Map.empty, OutputMode.Update()) shouldBe UpsertMode
    resolveMode(Map.empty, OutputMode.Complete()) shouldBe CompleteMode
    resolveMode(Map("mode" -> "upsert"), OutputMode.Append()) shouldBe UpsertMode
    an[IllegalArgumentException] should be thrownBy
      resolveMode(Map("mode" -> "append"), OutputMode.Update())
    an[IllegalArgumentException] should be thrownBy
      resolveMode(Map("mode" -> "complete"), OutputMode.Append())
    an[IllegalArgumentException] should be thrownBy
      resolveMode(Map("mode" -> "sideways"), OutputMode.Append())
  }

  test("table stream source: maxFilesPerTrigger splits the initial snapshot and later commits") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-adm").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartitionByRange(3, $"id"))
    t.manifest.get.files.size shouldBe 3

    val src = new TableStreamSource(spark.sqlContext, dir + "/t",
      t.manifest.get.schema, Map("maxFilesPerTrigger" -> "1"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet

    // the initial snapshot drains one file per trigger, not as one batch
    val o1 = GraftSourceOffset.of(src.getOffset.get)
    o1.isInitial shouldBe true
    o1.index shouldBe 0L
    val b1 = rows(src.batchFrame(None, o1))
    b1.size shouldBe 1
    val o2 = GraftSourceOffset.of(src.getOffset.get)
    val b2 = rows(src.batchFrame(Some(o1), o2))
    val o3 = GraftSourceOffset.of(src.getOffset.get)
    val b3 = rows(src.batchFrame(Some(o2), o3))
    // disjoint, complete
    (b1 ++ b2 ++ b3) shouldBe Set(1L, 2L, 3L)
    b1.intersect(b2) shouldBe empty
    b2.intersect(b3) shouldBe empty
    src.getOffset.map(GraftSourceOffset.of) shouldBe Some(o3) // drained

    // a later multi-file commit also arrives in bounded slices
    t.append(Seq((4L, "d"), (5L, "e")).toDF("id", "v")
      .repartitionByRange(2, $"id"))
    val o4 = GraftSourceOffset.of(src.getOffset.get)
    o4.isInitial shouldBe false
    val b4 = rows(src.batchFrame(Some(o3), o4))
    b4.size shouldBe 1
    val o5 = GraftSourceOffset.of(src.getOffset.get)
    val b5 = rows(src.batchFrame(Some(o4), o5))
    (b4 ++ b5) shouldBe Set(4L, 5L)
  }

  test("table stream source: restart mid-snapshot resumes without loss or duplication") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-adm2").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    val params = Map("maxFilesPerTrigger" -> "1")
    val schema = t.manifest.get.schema

    // incarnation 1 serves one batch, then "crashes"
    val srcA = new TableStreamSource(spark.sqlContext, dir + "/t", schema, params)
    val o1 = GraftSourceOffset.of(srcA.getOffset.get)
    val b1 = rows(srcA.batchFrame(None, o1))

    // incarnation 2: Spark replays the checkpointed interval first (the
    // v1 recovery contract), which re-seeds the source's position
    val srcB = new TableStreamSource(spark.sqlContext, dir + "/t", schema, params)
    val b1replay = rows(srcB.batchFrame(None, o1))
    b1replay shouldBe b1 // deterministic replay
    val o2 = GraftSourceOffset.of(srcB.getOffset.get)
    val b2 = rows(srcB.batchFrame(Some(o1), o2))
    val o3 = GraftSourceOffset.of(srcB.getOffset.get)
    val b3 = rows(srcB.batchFrame(Some(o2), o3))
    val o4 = GraftSourceOffset.of(srcB.getOffset.get)
    val b4 = rows(srcB.batchFrame(Some(o3), o4))
    (b1 ++ b2 ++ b3 ++ b4) shouldBe Set(1L, 2L, 3L, 4L)
    Seq(b2, b3, b4).foreach(_.intersect(b1) shouldBe empty)
  }

  test("table stream source: maxBytesPerTrigger prices files from the manifest") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-adm3").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartitionByRange(3, $"id"))
    // commits record per-file sizes in the manifest
    t.manifest.get.files.foreach(_.bytes.isDefined shouldBe true)

    // one parquet file is ~900 bytes here: a 1-byte budget still admits
    // one file per trigger (a file above budget must not stall the stream)
    val src = new TableStreamSource(spark.sqlContext, dir + "/t",
      t.manifest.get.schema, Map("maxBytesPerTrigger" -> "1"))
    val o1 = GraftSourceOffset.of(src.getOffset.get)
    src.batchFrame(None, o1).count() shouldBe 1
    val o2 = GraftSourceOffset.of(src.getOffset.get)
    src.batchFrame(Some(o1), o2).count() shouldBe 1
  }

  test("table stream source: Trigger.AvailableNow drains everything in bounded batches, then stops") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-anow").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .repartitionByRange(4, $"id"))
    t.append(Seq((5L, "e")).toDF("id", "v")) // a post-snapshot commit

    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("anow")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000) shouldBe true // drains and STOPS
    spark.table("anow").collect().map(_.getLong(0)).sorted.toSeq shouldBe
      Seq(1L, 2L, 3L, 4L, 5L)
    // bounded admission held: several small batches, not one mega-batch
    q.recentProgress.count(_.numInputRows > 0) should be >= 3
  }

  test("table stream source: schema drift mid-stream null-fills dropped columns and casts widened types") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a", "x")).toDF("id", "v", "extra"))
    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t").load()
      .writeStream.format("memory").queryName("drift")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // a later version DROPS the extra column: its rows null-fill
      t.overwriteAll(Seq((2L, "b")).toDF("id", "v"))
      q.processAllAvailable()
      // and one with a NARROWER id type: cast back to the declared long
      t.overwriteAll(Seq((3, "c")).toDF("id", "v"))
      q.processAllAvailable()
      val rows = spark.table("drift").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
        .sortBy(_._1)
      rows shouldBe Array(
        (1L, "a", Some("x")), (2L, "b", None), (3L, "c", None))
    } finally q.stop()
  }

  test("interval join on two real streams matches only rows inside the range") {
    val clicks = MemoryStream[Event](spark)
    val views = MemoryStream[Event](spark)
    val joined = StreamOps.intervalJoin(
      clicks.toDF().select($"user_id", $"ts".as("click_ts")),
      views.toDF().select($"user_id", $"ts".as("view_ts")),
      "user_id", "click_ts", "view_ts",
      before = "5 minutes", after = "0 seconds", watermarkDelay = "2 minutes")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      views.addData(
        Event(1, ts(1), "view"),  // 3 min before the click: in range
        Event(1, ts(9), "view"),  // after the click: out (after = 0)
        Event(2, ts(2), "view"))  // other user: out
      clicks.addData(Event(1, ts(4), "click"))
      q.processAllAvailable()
      val rows = spark.table("ij")
        .select("user_id", "click_ts", "view_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      rows.toSet shouldBe Set((1L, ts(4), ts(1)))
    } finally q.stop()
  }

  test("batch sessionization agrees with the streaming sessionizer's contract") {
    val df = Seq(
      (5L, ts(1)), (5L, ts(2)), (5L, ts(20)), (5L, ts(21)),
      (7L, ts(1)), (7L, ts(2)), (7L, ts(3))).toDF("user_id", "ts")
    val out = StreamOps.sessionizeBatch(df, "user_id", "ts",
      gapMicros = 5L * 60 * 1000000)
      .orderBy("user_id", "session_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))) shouldBe
      Array((5L, 1L, 2L), (5L, 2L, 2L), (7L, 1L, 3L))
    // session boundaries are member-event timestamps
    out.head.getTimestamp(2) shouldBe ts(1)
    out.head.getTimestamp(3) shouldBe ts(2)
  }

  test("in-batch gap split emits two sessions for one user") {
    val input = MemoryStream[Event](spark)
    val sessions = sessionize(input.toDS(), gapMs = 5 * 60 * 1000, "1 minute")
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // one batch containing two bursts separated by > gap: the first
      // session emits immediately (closed inside the batch)
      input.addData(
        Event(5, ts(1), "a"), Event(5, ts(2), "b"),
        Event(5, ts(20), "c"), Event(5, ts(21), "d"))
      q.processAllAvailable()
      val out = spark.table("sess2").as[Session].collect()
      out should have length 1
      out.head.n_events shouldBe 2L
      out.head.session_end shouldBe ts(2)
    } finally q.stop()
  }

  test("change feed stream: per-commit classified rows from startingVersion 0") {
    import graft.tables.{ManagedTable, MergeInto}
    val dir = java.nio.file.Files.createTempDirectory("graft-cdf").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))          // v0
    MergeInto.byKey(t, Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()       // v1
    t.delete("id = 2") shouldBe 1L                                      // v2

    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("memory").queryName("cdf")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdf")
        .select("id", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      rows shouldBe Set(
        (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),   // v0 snapshot
        (1L, "a2", "update_postimage", 1L), (3L, "c", "insert", 1L),
        (2L, "b", "delete", 2L))

      // a live commit keeps flowing through the open stream
      t.append(Seq((4L, "d")).toDF("id", "v"))                          // v3
      q.processAllAvailable()
      spark.table("cdf").filter($"_commit_version" === 3L).collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq shouldBe
        Seq((4L, "insert"))
    } finally q.stop()
  }

  test("change feed stream: changeFeedPreimages pairs updates with their old rows") {
    import graft.tables.{ManagedTable, MergeInto}
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfpre").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))          // v0
    MergeInto.byKey(t, Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()       // v1

    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("changeFeedPreimages", "true")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("memory").queryName("cdfpre")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdfpre")
        .select("id", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSet
      rows shouldBe Set(
        (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),   // v0 snapshot
        (1L, "a", "update_preimage", 1L),                   // old image
        (1L, "a2", "update_postimage", 1L), (3L, "c", "insert", 1L))
    } finally q.stop()
  }

  test("change feed stream: startingTimestamp replays from the first commit at or after it") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-cdft").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))                      // v0
    Thread.sleep(5)
    t.append(Seq((2L, "b")).toDF("id", "v"))                            // v1
    t.append(Seq((3L, "c")).toDF("id", "v"))                            // v2
    // an instant strictly between v0 and v1 → replay starts at v1
    val v0ts = t.history().find(_.version == 0L).get.timestampMs
    val v1ts = t.history().find(_.version == 1L).get.timestampMs
    v1ts should be > v0ts
    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingTimestamp", v1ts.toString) // epoch-millis form
      .load()
      .writeStream.format("memory").queryName("cdft")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cdft")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      rows shouldBe Set((2L, "insert", 1L), (3L, "insert", 2L))
    } finally q.stop()

    // both options together are rejected; date forms parse as UTC
    intercept[IllegalArgumentException] {
      new ChangeFeedStreamSource(spark.sqlContext, dir + "/t",
        t.manifest.get.schema, Map("changeFeedKeys" -> "id",
          "startingVersion" -> "0", "startingTimestamp" -> "2024-01-01"))
    }
    ChangeFeedStreamSource.parseTs("2024-01-10 10:00:00") shouldBe
      java.time.Instant.parse("2024-01-10T10:00:00Z").toEpochMilli
    ChangeFeedStreamSource.parseTs("2024-01-10") shouldBe
      java.time.Instant.parse("2024-01-10T00:00:00Z").toEpochMilli
  }

  test("change feed stream: default latest skips history; version cap splits batches") {
    import graft.tables.ManagedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfl").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "old")).toDF("id", "v"))                    // v0: history
    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdfl")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      spark.table("cdfl").count() shouldBe 0 // latest: v0 not replayed

      t.append(Seq((2L, "b")).toDF("id", "v"))                          // v1
      t.append(Seq((3L, "c")).toDF("id", "v"))                          // v2
      q.processAllAvailable()
      val rows = spark.table("cdfl")
        .select("id", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      rows shouldBe Set((2L, "insert", 1L), (3L, "insert", 2L))
      // maxVersionsPerTrigger=1 → the two commits arrived in two batches
      q.recentProgress.count(_.numInputRows > 0) should be >= 2
    } finally q.stop()
  }

  test("change feed stream: Trigger.AvailableNow drains the backlog, then stops") {
    import graft.tables.{ManagedTable, MergeInto}
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfa").toString
    val t = ManagedTable(spark, dir + "/t")
    t.overwriteAll(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))          // v0
    MergeInto.byKey(t, Seq((1L, "a2")).toDF("id", "v"), "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()       // v1
    t.append(Seq((3L, "c")).toDF("id", "v"))                           // v2

    val q = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", dir + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdfa")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000) shouldBe true // drains the cap, then stops
    val rows = spark.table("cdfa")
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    rows shouldBe Set(
      (1L, "a", "insert", 0L), (2L, "b", "insert", 0L),
      (1L, "a2", "update_postimage", 1L),
      (3L, "c", "insert", 2L))
  }

  test("change feed offset walk: exactly-once under random commits, caps, restarts") {
    // the CDF twin of the admission-walk property test: randomized commit
    // shapes, per-trigger version caps, and source restarts at arbitrary
    // checkpoints — every commit's changes must be emitted exactly once,
    // stamped with the right _commit_version
    import graft.tables.ManagedTable
    val rnd = new scala.util.Random(7)
    val dir = java.nio.file.Files.createTempDirectory("graft-cdfp").toString
    val t = ManagedTable(spark, dir + "/t")
    var nextId = 0L
    val expected = scala.collection.mutable.Map.empty[Long, Long] // id → version
    def commit(n: Int, first: Boolean): Unit = {
      val rows = (0 until n).map { _ => nextId += 1; (nextId, s"r$nextId") }
      val d = rows.toDF("id", "v").repartition(1)
      if (first) t.overwriteAll(d) else t.append(d)
      val v = t.currentVersion.get
      rows.foreach { case (id, _) => expected(id) = v }
    }
    commit(3, first = true)
    (0 until 3).foreach(_ => commit(1 + rnd.nextInt(2), first = false))

    val schema = t.manifest.get.schema
    def mkSource(maxV: Int) = new ChangeFeedStreamSource(spark.sqlContext,
      dir + "/t", schema, Map("changeFeedKeys" -> "id",
        "startingVersion" -> "0", "maxVersionsPerTrigger" -> maxV.toString))

    var src = mkSource(1 + rnd.nextInt(3))
    var start: Option[GraftSourceOffset] = None
    val seen = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    var idle = 0
    var steps = 0
    while (idle < 2 && steps < 60) {
      steps += 1
      val res = src.latestOffset(start.orNull, src.getDefaultReadLimit)
      val end = Option(res).map(GraftSourceOffset.of)
      if (end.isEmpty || end == start) {
        idle += 1
        if (idle == 1 && nextId < 12) commit(1 + rnd.nextInt(2), first = false)
      } else {
        idle = 0
        val from = start.map(_.version).getOrElse(end.get.index)
        seen ++= src.feedFrame(from, end.get.version)
          .select("id", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        start = end // "checkpoint"
        if (rnd.nextBoolean()) src = mkSource(1 + rnd.nextInt(3))
      }
    }
    seen.map(_._1).sorted.toSeq shouldBe (1L to nextId).toSeq // exactly once
    seen.foreach { case (id, ct, v) =>
      ct shouldBe "insert"
      v shouldBe expected(id) // stamped with the commit that landed it
    }
  }

  test("change feed stream: checkpoint restart resumes exactly-once") {
    import graft.tables.{ManagedTable, MergeInto}
    val base = java.nio.file.Files.createTempDirectory("graft-cdfr").toString
    val t = ManagedTable(spark, base + "/t")
    t.overwriteAll(Seq((1L, "a")).toDF("id", "v"))                      // v0
    def start() = spark.readStream
      .format(classOf[TableStreamProvider].getName)
      .option("path", base + "/t")
      .option("changeFeed", "true")
      .option("changeFeedKeys", "id")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("parquet")
      .option("path", base + "/out")
      .option("checkpointLocation", base + "/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    MergeInto.byKey(t, Seq((1L, "a2")).toDF("id", "v"), "id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()       // v1

    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(base + "/out")
      .select("id", "v", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    out.toSet shouldBe Set(
      (1L, "a", "insert", 0L), (1L, "a2", "update_postimage", 1L))
    out.length shouldBe 2 // exactly once across both incarnations
  }
}
