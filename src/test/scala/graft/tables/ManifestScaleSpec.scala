package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Quantifies the table layer's last 100×-scale claim: that a ~100k-file
  * manifest (the shape of a multi-TB table) stays driver-tractable.
  * Built synthetically through [[ManagedTable.importFiles]] — no data
  * files are written, exactly as an in-place conversion of an existing
  * lake would look.
  *
  * Measured on the round-7 build box (32-core, local JVM, times include
  * one Spark job for the sidecar write/read):
  *   import commit (checkpoint + parquet sidecar)  ≈ 3-6 s
  *   cold snapshot reconstruction (sidecar read)   ≈ 1-3 s
  *   driver-side partition pruning over 100k files ≈ 10-40 ms
  *   min/max data skipping over 100k files         ≈ 50-200 ms
  *   incremental commit on top                     ≈ O(10) record, < 16 KB
  *   retained heap for the snapshot                ≈ 40-80 MB
  * The asserted ceilings below are several× the measured numbers so
  * scheduler/GC noise cannot flake the suite; they still catch any
  * accidental O(files²) or driver-serialized-JSON regression. */
class ManifestScaleSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-scale").toString

  private def secs[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("100k-file manifest: sidecar checkpoint, pruning, and O(delta) commits stay bounded") {
    val n = 100000
    val root = tmp() + "/big"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType),
      StructField("day", StringType)))
    // ~336 partitions × ~300 files, disjoint per-file ts ranges
    val files = (0 until n).map { i =>
      val day = f"2026-${1 + i % 12}%02d-${1 + (i / 12) % 28}%02d"
      TableFile(s"data/c0/day=$day/part-$i.parquet", Map("day" -> day),
        Map("ts" -> ColStats("long",
          (i * 1000L).toString, (i * 1000L + 999).toString)))
    }

    val t = ManagedTable(spark, root)
    val (_, commitSec) = secs(t.importFiles(schema, Seq("day"), files))
    info(f"import commit of $n files: $commitSec%.2f s")
    commitSec should be < 60.0

    // the record itself must be tiny — the file list lives in the parquet
    // sidecar, not driver-serialized JSON (the ~1M-file scaling wall)
    val recordPath = java.nio.file.Paths.get(
      root, "_graft", "manifests", f"v${0L}%020d.json")
    java.nio.file.Files.size(recordPath) should be < 4096L
    java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_graft",
      "manifests", f"v${0L}%020d${ManagedTable.SidecarSuffix}")) shouldBe true

    // cold reconstruction (fresh table instance → empty snapshot cache),
    // with a coarse retained-heap ceiling for the driver-side snapshot
    def usedHeap(): Long = {
      System.gc(); Thread.sleep(100); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    val heapBefore = usedHeap()
    val cold = ManagedTable(spark, root)
    val (m, readSec) = secs(cold.manifest.get)
    info(f"cold sidecar reconstruction: $readSec%.2f s")
    m.files.size shouldBe n
    readSec should be < 30.0
    val heapAfter = usedHeap()
    val retainedMb = (heapAfter - heapBefore) / 1e6
    info(f"retained heap for snapshot: $retainedMb%.0f MB")
    retainedMb should be < 500.0

    // driver-side partition pruning: O(files) scan of in-memory entries
    val (pruned, pruneSec) = secs(
      m.files.filter(_.partitionValues.get("day").contains("2026-01-01")))
    info(f"partition pruning over $n entries: ${pruneSec * 1000}%.0f ms")
    pruned.size should be > 0
    pruned.size should be < n / 100 // ~1/336th of the table
    pruneSec should be < 2.0

    // min/max data skipping over all 100k stats entries
    val (inRange, skipSec) = secs(
      cold.filesInRange("ts", Some(5000000L), Some(5100999L)))
    info(f"stats skipping over $n entries: ${skipSec * 1000}%.0f ms")
    inRange.size shouldBe 101 // files i=5000..5100
    skipSec should be < 5.0

    // a small commit on top of the 100k-file version must write an
    // O(touched) incremental record, not another O(table) checkpoint
    val extra = (0 until 10).map(i =>
      TableFile(s"data/c1/day=2026-01-01/extra-$i.parquet",
        Map("day" -> "2026-01-01")))
    val (_, deltaSec) = secs(t.importFiles(schema, Seq("day"), extra))
    info(f"incremental commit of 10 files: $deltaSec%.2f s")
    deltaSec should be < 10.0
    val deltaRecord = java.nio.file.Paths.get(
      root, "_graft", "manifests", f"v${1L}%020d.json")
    java.nio.file.Files.size(deltaRecord) should be < 16384L
    t.manifest.get.files.size shouldBe n + 10

    // schema / partition mismatches are rejected on existing tables
    intercept[graft.metadata.MetadataException](
      t.importFiles(StructType(Seq(StructField("other", LongType))),
        Seq("day"), extra))
    intercept[graft.metadata.MetadataException](
      t.importFiles(schema, Seq("other"), extra))
  }

  test("1M-file manifest: the quantified ceiling of the driver-side metadata layer") {
    // The shape of a ~100 TB table at ~100 MB/file. Everything O(files)
    // must stay parquet-sidecar-backed and driver-tractable; the asserted
    // ceilings are several× the measured values (see info output) so GC
    // noise cannot flake the suite, while still catching any O(files²)
    // or driver-serialized-JSON regression at this scale.
    //
    // Measured on the round-9 build box (32-core, 8g heap):
    //   import commit (checkpoint + parquet sidecar)  ≈ 9 s
    //   cold snapshot reconstruction (sidecar read)   ≈ 3 s
    //   driver-side partition pruning over 1M files   ≈ 160 ms
    //   min/max data skipping over 1M files           ≈ 500 ms
    //   incremental commit of 10 files on top         ≈ 0.2 s, < 16 KB record
    val n = 1000000
    val root = tmp() + "/huge"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType),
      StructField("day", StringType)))
    val files = (0 until n).map { i =>
      val day = f"2026-${1 + i % 12}%02d-${1 + (i / 12) % 28}%02d"
      TableFile(s"data/c0/day=$day/part-$i.parquet", Map("day" -> day),
        Map("ts" -> ColStats("long",
          (i * 1000L).toString, (i * 1000L + 999).toString)))
    }

    val t = ManagedTable(spark, root)
    val (_, commitSec) = secs(t.importFiles(schema, Seq("day"), files))
    info(f"import commit of $n files: $commitSec%.2f s")
    commitSec should be < 180.0

    val recordPath = java.nio.file.Paths.get(
      root, "_graft", "manifests", f"v${0L}%020d.json")
    java.nio.file.Files.size(recordPath) should be < 4096L

    val cold = ManagedTable(spark, root)
    val (m, readSec) = secs(cold.manifest.get)
    info(f"cold sidecar reconstruction: $readSec%.2f s")
    m.files.size shouldBe n
    readSec should be < 90.0

    val (pruned, pruneSec) = secs(
      m.files.filter(_.partitionValues.get("day").contains("2026-01-01")))
    info(f"partition pruning over $n entries: ${pruneSec * 1000}%.0f ms")
    pruned.size should be > 0
    pruneSec should be < 10.0

    val (inRange, skipSec) = secs(
      cold.filesInRange("ts", Some(500000000L), Some(500100999L)))
    info(f"stats skipping over $n entries: ${skipSec * 1000}%.0f ms")
    inRange.size shouldBe 101
    skipSec should be < 20.0

    // a small commit on top must stay O(touched), not O(table)
    val extra = (0 until 10).map(i =>
      TableFile(s"data/c1/day=2026-01-01/extra-$i.parquet",
        Map("day" -> "2026-01-01")))
    val (_, deltaSec) = secs(t.importFiles(schema, Seq("day"), extra))
    info(f"incremental commit of 10 files on 1M: $deltaSec%.2f s")
    deltaSec should be < 30.0
    val deltaRecord = java.nio.file.Paths.get(
      root, "_graft", "manifests", f"v${1L}%020d.json")
    java.nio.file.Files.size(deltaRecord) should be < 16384L
    t.manifest.get.files.size shouldBe n + 10
  }
}
