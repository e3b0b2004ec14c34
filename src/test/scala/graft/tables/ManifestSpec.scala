package graft.tables

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Manifest serialization and statistics-comparison contracts. */
class ManifestSpec extends AnyFunSuite with Matchers {

  test("manifest JSON round-trips files, partition values, and stats") {
    val m = Manifest(
      version = 7,
      schemaJson = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))).json,
      partitionColumns = Seq("day"),
      files = Seq(
        TableFile("data/c1/p1.parquet", Map("day" -> "2024-01-01"),
          Map("id" -> ColStats("long", "1", "99"),
            "name" -> ColStats("string", "alice", "zed"))),
        TableFile("data/c1/p2.parquet", Map("day" -> "2024-01-02"))),
      operation = "append",
      timestampMs = 123456789L)
    val back = Manifest.fromJsonString(m.toJsonString)
    back shouldBe m
    back.schema.fields.map(_.name).toSeq shouldBe Seq("id")
  }

  test("incremental record round-trips and applies adds/removes to a base") {
    val base = Manifest(3, "{}", Seq("day"),
      Seq(TableFile("data/a.parquet", Map("day" -> "d1")),
        TableFile("data/b.parquet", Map("day" -> "d2"))),
      "overwrite", 1L)
    val inc = IncrementalManifest(4, "{}", Seq("day"), baseVersion = 3,
      adds = Seq(TableFile("data/c.parquet", Map("day" -> "d2"),
        Map("id" -> ColStats("long", "5", "9")))),
      removes = Seq("data/b.parquet"), operation = "replacePartitions",
      timestampMs = 2L)
    Manifest.recordFromJsonString(inc.toJsonString) shouldBe Right(inc)
    val snap = inc.applyTo(base)
    snap.version shouldBe 4
    snap.files.map(_.path) shouldBe Seq("data/a.parquet", "data/c.parquet")
    // the legacy full format parses as a full record (old tables readable)
    Manifest.recordFromJsonString(base.toJsonString) shouldBe Left(base)
  }

  test("overlaps: inclusive bounds, open ends, non-comparable keeps file") {
    val s = ColStats("long", "10", "20")
    s.overlaps(Some(20L), None) shouldBe true  // inclusive at max
    s.overlaps(None, Some(10L)) shouldBe true  // inclusive at min
    s.overlaps(Some(21L), None) shouldBe false
    s.overlaps(None, Some(9L)) shouldBe false
    s.overlaps(None, None) shouldBe true
    // non-numeric bound against long stats: conservatively kept
    s.overlaps(Some("2024-01-01"), None) shouldBe true
  }

  test("string stats compare in unsigned UTF-8 byte order") {
    // U+1F600 (F0 9F 98 80) sorts ABOVE U+FFFD (EF BF BD) in byte order,
    // but BELOW it under Java's UTF-16 compareTo — the byte order is
    // parquet's, so a range on the emoji must keep this file
    val s = ColStats("string", "a", "�")
    ColStats.compareUtf8("😀", "�") should be > 0
    "😀".compareTo("�") should be < 0 // the trap we avoid
    s.overlaps(Some("😀"), None) shouldBe false // correctly skippable
    ColStats("string", "a", "😀").overlaps(Some("�"), None) shouldBe true
  }

  test("merge metrics resolve delete-prefixed tags") {
    val m = MergeBuilder.MergeMetrics(Map("del:m0" -> 5L, "nm1" -> 2L))
    m.count("m0") shouldBe 5L
    m.count("nm1") shouldBe 2L
    m.count("missing") shouldBe 0L
  }

  test("format guard: future-format records fail cleanly, current read fine") {
    val m = Manifest(0L,
      org.apache.spark.sql.types.StructType(Nil).json, Nil, Nil, "t", 1L)
    // absent format (every record written so far) = format 1: reads
    Manifest.recordFromJsonString(m.toJsonString).isLeft shouldBe true
    // an explicit current-format stamp also reads
    val stamped = m.toJsonString.replaceFirst("\\{", """{"format":1,""")
    Manifest.recordFromJsonString(stamped).isLeft shouldBe true
    // a FUTURE writer's record must refuse, not misread
    val future = m.toJsonString.replaceFirst("\\{", """{"format":99,""")
    val ex = intercept[IllegalArgumentException](
      Manifest.recordFromJsonString(future))
    ex.getMessage should include("format 99")
  }
}
