package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Persistent IVF index: parity with the in-memory IVF operator,
  * incremental append, and the cell-partitioned layout that makes probe
  * reads prunable. */
class AnnIndexSpec extends AnyFunSuite with Matchers {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  /** Deterministic corpus: 20 vectors on a 4-dim simplex-ish layout so
    * cell membership is unambiguous. */
  private def corpus = {
    val rows = (0L until 20L).map { i =>
      val base = Array.fill(4)(0.05f)
      base((i % 4).toInt) = 1.0f + (i / 4) * 0.01f
      (i, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_test/annindex_$name"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  test("index search reproduces the in-memory IVF operator bit-for-bit") {
    val c = corpus
    val cb = AnnIndex.seedCodebook(c, "vec_id", "embedding", 4)
    val idx = AnnIndex.create(spark, c, "vec_id", "embedding", cb,
      freshRoot("parity"))
    val q = c.filter(col("vec_id") < 6)
    val got = idx.search(q, "vec_id", "embedding", nProbe = 2, k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val want = SimilarityOps.ivfTopKWith(q, c, cb, "vec_id", "embedding",
        nProbe = 2, k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    got should not be empty
    got shouldBe want
  }

  test("vectors land cell-partitioned, so probe reads prune to probed cells") {
    val idx = AnnIndex.create(spark, corpus, "vec_id", "embedding",
      AnnIndex.seedCodebook(corpus, "vec_id", "embedding", 4),
      freshRoot("layout"))
    val m = idx.vectorsTable.manifest.get
    m.partitionColumns shouldBe Seq("cid")
    // every file carries its cell id, and no file spans two cells — the
    // property manifest partition pruning needs
    val cells = m.files.map(_.partitionValues.get("cid"))
    all(cells) should not be empty
    cells.flatten.toSet.size should be > 1
    // a one-cell read touches strictly fewer files than the table holds
    val one = cells.flatten.head
    m.files.count(_.partitionValues.get("cid").contains(one)) should
      be < m.files.size
    idx.indexedVectors shouldBe Some(20L)
  }

  test("compressed (IVF-PQ) index reproduces in-memory ivfPqTopK bit-for-bit") {
    val c = corpus
    val (dims, m, ksub, nCent) = (4, 2, 4, 4)
    val idx = PqAnnIndex.create(spark, c, "vec_id", "embedding",
      AnnIndex.seedCodebook(c, "vec_id", "embedding", nCent),
      SimilarityOps.pqCodebook(c, "vec_id", "embedding", dims, m, ksub),
      dims, m, freshRoot("pq"))
    val q = c.filter(col("vec_id") < 6)
    val got = idx.search(q, "vec_id", "embedding", nProbe = 2, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val want = SimilarityOps.ivfPqTopK(q, c, "vec_id", "embedding",
        dims, m, nCentroids = nCent, nProbe = 2, ksub = ksub, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    got should not be empty
    got shouldBe want
    // and the compressed scan is cell-partitioned like the raw index
    idx.codesTable.manifest.get.partitionColumns shouldBe Seq("cell")
  }

  test("compressed index appendVectors encodes a new batch into existing cells") {
    val c = corpus
    val (dims, m, ksub, nCent) = (4, 2, 4, 4)
    val idx = PqAnnIndex.create(spark, c, "vec_id", "embedding",
      AnnIndex.seedCodebook(c, "vec_id", "embedding", nCent),
      SimilarityOps.pqCodebook(c, "vec_id", "embedding", dims, m, ksub),
      dims, m, freshRoot("pq_append"))
    val extra = Seq((100L, Array(1.0f, 0.05f, 0.05f, 0.05f)))
      .toDF("vec_id", "embedding")
    idx.appendVectors(extra, "vec_id", "embedding")
    // the appended vector is discoverable through the compressed search
    val hits = idx.search(c.filter(col("vec_id") === 0L), "vec_id",
        "embedding", nProbe = nCent, k = 21)
      .collect().map(_.getLong(1))
    hits should contain(100L)
  }

  test("compressed search before create fails descriptively, not with an NPE") {
    val idx = PqAnnIndex(spark, freshRoot("pq_missing"))
    idx.exists shouldBe false
    val ex = intercept[IllegalStateException] {
      idx.search(corpus.filter(col("vec_id") === 0L), "vec_id", "embedding",
        nProbe = 1, k = 3).collect()
    }
    ex.getMessage should include("create the index")
  }

  test("trained codebook and table maintenance compose with the index") {
    val c = corpus
    // a k-means-trained codebook plugs in exactly like the seed one
    val trained = SimilarityOps.kMeansCodebook(c, "vec_id", "embedding",
      k = 4, iters = 2)
    val idx = AnnIndex.create(spark, c, "vec_id", "embedding", trained,
      freshRoot("trained"))
    val hits = idx.search(c.filter(col("vec_id") < 4), "vec_id", "embedding",
      nProbe = 2, k = 3)
    hits.count() should be > 0L
    // the vectors table is a managed table: small-file compaction
    // maintains the index without changing a single search result
    val before = hits.orderBy("query_id", "rank").collect().toSeq
    idx.vectorsTable.compactSmall(smallBytes = 1L << 20)
    val after = idx.search(c.filter(col("vec_id") < 4), "vec_id", "embedding",
        nProbe = 2, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    after shouldBe before
  }

  test("appendVectors indexes a new batch into existing cells without retrain") {
    val c = corpus
    val idx = AnnIndex.create(spark, c, "vec_id", "embedding",
      AnnIndex.seedCodebook(c, "vec_id", "embedding", 4),
      freshRoot("append"))
    // a new vector essentially identical to vec 0's direction: it must be
    // assigned to vec 0's cell and come back as its top neighbor
    val extra = Seq((100L, Array(1.0f, 0.05f, 0.05f, 0.05f)))
      .toDF("vec_id", "embedding")
    idx.appendVectors(extra, "vec_id", "embedding")
    idx.indexedVectors shouldBe Some(21L)
    val hits = idx.search(c.filter(col("vec_id") === 0L), "vec_id",
        "embedding", nProbe = 1, k = 3)
      .orderBy("rank").collect().map(_.getLong(1))
    hits should contain(100L)
    // and the appended commit touched only the affected cell: the second
    // version adds files only under vec-0's cell partition
    val t = idx.vectorsTable
    val v0 = t.readManifest(0L).files.map(_.path).toSet
    val added = t.manifest.get.files.filterNot(f => v0.contains(f.path))
    added should not be empty
    added.flatMap(_.partitionValues.get("cid")).toSet.size shouldBe 1
  }

  test("indexStream file count stays bounded across 24 micro-batches " +
      "(auto-compaction cadence per cell)") {
    val c = corpus
    val root = freshRoot("compact")
    val idx = AnnIndex.create(spark, c, "vec_id", "embedding",
      AnnIndex.seedCodebook(c, "vec_id", "embedding", 4), root)
    spark.conf.set("spark.graft.autoCompact.smallBytes", (1L << 20).toString)
    spark.conf.set("spark.graft.autoCompact.minSmallFiles", "4")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = idx.indexStream(ms.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$root/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      (1 to 24).foreach { b =>
        val v = Array.fill(4)(0.05f); v(b % 4) = 1.0f + b * 0.001f
        ms.addData((1000L + b, v))
        q.processAllAvailable()
      }
      // without the cadence: one file per touched cell per batch (~24
      // beyond the build's); the fold keeps steady state within one
      // window per cell (4 cells × fold window of 4, plus the carry)
      val files = idx.vectorsTable.manifest.get.files.size
      withClue(s"vector files=$files\n") { files should be <= 20 }
      idx.indexedVectors shouldBe Some(44L)
      // probes still prune to cells and find streamed vectors
      idx.search(c.filter(col("vec_id") === 0L), "vec_id", "embedding",
          nProbe = 1, k = 30)
        .collect().map(_.getLong(1)) should contain(1004L)
    } finally {
      q.stop()
      spark.conf.unset("spark.graft.autoCompact.smallBytes")
      spark.conf.unset("spark.graft.autoCompact.minSmallFiles")
    }
  }

  test("indexStream ingests a live vector stream exactly-once; replayed " +
      "batches append nothing") {
    val c = corpus
    val root = freshRoot("stream")
    val idx = AnnIndex.create(spark, c, "vec_id", "embedding",
      AnnIndex.seedCodebook(c, "vec_id", "embedding", 4), root)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    val q = idx.indexStream(ms.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$root/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      ms.addData((100L, Array(1.0f, 0.05f, 0.05f, 0.05f)))
      q.processAllAvailable()
      ms.addData((101L, Array(0.05f, 1.0f, 0.05f, 0.05f)))
      q.processAllAvailable()
      idx.indexedVectors shouldBe Some(22L)
      // streamed vectors are immediately searchable in their cells
      idx.search(c.filter(col("vec_id") === 0L), "vec_id", "embedding",
          nProbe = 1, k = 3)
        .collect().map(_.getLong(1)) should contain(100L)
    } finally q.stop()
    // replay: a restarted query re-delivering batch 0 must append nothing
    val v = idx.vectorsTable.currentVersion
    implicit val sq2: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])](spark)
    // same checkpoint → same writer identity and batch sequence
    val q2 = idx.indexStream(ms2.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$root/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try { q2.processAllAvailable() } finally q2.stop()
    idx.vectorsTable.currentVersion shouldBe v
    idx.indexedVectors shouldBe Some(22L)
  }
}
