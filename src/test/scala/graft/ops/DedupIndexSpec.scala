package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Persistent MinHash/LSH dedup index: bit-for-bit parity with the
  * in-memory cross-corpus operator, incremental append, and the
  * bucket-partitioned layout that makes both index reads prunable. */
class DedupIndexSpec extends AnyFunSuite with Matchers {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  /** Deterministic corpus with planted near-dups: doc 3k repeats doc
    * 3k+1's text with one word changed, so band collisions are certain;
    * other docs are word-disjoint. */
  private def docs = {
    val rows = (0L until 30L).map { i =>
      val fam = i / 3
      val words = (0 until 12).map(w => s"w${fam}_$w")
      val text =
        if (i % 3 == 2) (words.dropRight(1) :+ s"alt$i").mkString(" ")
        else words.mkString(" ")
      (i, text)
    }
    rows.toDF("doc_id", "text")
  }

  private def freshRoot(name: String): String = {
    val root = s"/tmp/graft_test/dedupindex_$name"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("in_id", "corpus_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSeq

  test("index search reproduces crossCorpusNearDupPairs bit-for-bit") {
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val expected = canon(
      TextOps.crossCorpusNearDupPairs(batch, corpus, "doc_id", "text"))
    expected should not be empty // the fixture must actually collide
    val idx = DedupIndex.create(spark, corpus, "doc_id", "text",
      freshRoot("parity"))
    canon(idx.nearDupPairs(batch, "doc_id", "text")) shouldBe expected
  }

  test("append extends the corpus without re-signing it") {
    val first = docs.filter(col("doc_id") < 15 && col("doc_id") % 10 =!= 0)
    val second = docs.filter(col("doc_id") >= 15 && col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val idx = DedupIndex.create(spark, first, "doc_id", "text",
      freshRoot("append"))
    idx.append(second, "doc_id", "text")
    val expected = canon(TextOps.crossCorpusNearDupPairs(
      batch, first.unionAll(second), "doc_id", "text"))
    canon(idx.nearDupPairs(batch, "doc_id", "text")) shouldBe expected
    // engine-written commits record row counts → metadata-only size
    idx.indexedDocs shouldBe defined
  }

  test("bucket partitioning is real: tables partition by bkt/sbkt") {
    val idx = DedupIndex.create(spark,
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      freshRoot("layout"))
    idx.bandsTable.manifest.get.partitionColumns shouldBe Seq("bkt")
    idx.sigsTable.manifest.get.partitionColumns shouldBe Seq("sbkt")
    // every file carries its bucket in the manifest — the prune substrate
    idx.bandsTable.manifest.get.files.foreach(
      _.partitionValues.keySet shouldBe Set("bkt"))
    // a one-doc batch hits a strict subset of band buckets
    val one = docs.filter(col("doc_id") === 1L)
    val oneBkts = DedupIndex.flatBands(
      TextOps.minHashSignatures(one, "doc_id", "text"),
      DedupIndex.DefaultBuckets)
      .select("bkt").distinct().collect().map(_.getString(0)).toSet
    val allBkts = idx.bandsTable.manifest.get.files
      .flatMap(_.partitionValues.get("bkt")).toSet
    oneBkts.size should be < DedupIndex.DefaultBuckets
    // the pruned read only touches matching buckets' files
    val pruned = idx.bandsTable.readPartitionsIn(Map("bkt" -> oneBkts))
    pruned.select("bkt").distinct().collect().map(_.getString(0))
      .toSet.subsetOf(oneBkts) shouldBe true
    allBkts should not be empty
  }

  test("no collisions: a disjoint batch yields zero pairs and empty-prune safety") {
    val corpus = docs.filter(col("doc_id") < 6)
    val idx = DedupIndex.create(spark, corpus, "doc_id", "text",
      freshRoot("disjoint"))
    val alien = Seq((100L, "zz1 zz2 zz3 zz4 zz5 zz6")).toDF("doc_id", "text")
    idx.nearDupPairs(alien, "doc_id", "text").count() shouldBe 0L
  }
}
