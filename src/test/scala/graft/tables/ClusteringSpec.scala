package graft.tables

import graft.metadata.MetadataException
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Incremental clustering (Delta liquid's shape): CLUSTER BY declares
  * layout intent, maintenance delivers it — each [[ManagedTable.cluster]]
  * pass Z-orders only the files that arrived since the last pass. */
class ClusteringSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-cluster").toString

  test("declare, cluster, and the row set is untouched") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    val df = (1 to 2000).map(i => ((i * 37) % 2000, i)).toDF("k", "v")
    t.overwriteAll(df.repartition(8))
    t.setClusterBy(Seq("k"))
    t.clusterBy shouldBe Seq("k")
    t.cluster() shouldBe 8 // every file is new to clustering
    t.read().count() shouldBe 2000L
    t.read().agg(sum("v")).collect()(0).getLong(0) shouldBe
      (1 to 2000).map(_.toLong).sum
  }

  test("incremental: a later pass rewrites only post-watermark files") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 1000).map(i => ((i * 37) % 1000, i)).toDF("k", "v")
      .repartition(6))
    t.setClusterBy(Seq("k"))
    t.cluster() shouldBe 6
    val clustered = t.manifest.get.files.map(_.path).toSet
    // two appended commits -> only their files qualify next pass
    t.append((1001 to 1200).map(i => (i % 1000, i)).toDF("k", "v").coalesce(1))
    t.append((1201 to 1400).map(i => (i % 1000, i)).toDF("k", "v").coalesce(1))
    t.cluster() shouldBe 2
    // the first generation's files survived the second pass untouched
    val after = t.manifest.get.files.map(_.path).toSet
    clustered.subsetOf(after) shouldBe true
    t.read().count() shouldBe 1400L
    // nothing new: the pass is a no-op, no commit
    val v = t.manifest.get.version
    t.cluster() shouldBe 0
    t.manifest.get.version shouldBe v
  }

  test("clustering narrows per-file ranges -> skipping reads fewer files") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    // interleaved keys: every unclustered file spans ~the full domain
    t.overwriteAll((1 to 4000).map(i => ((i * 631) % 4000, i)).toDF("k", "v")
      .repartition(8))
    val before = t.filesInRange("k", Some(100), Some(200)).size
    before shouldBe 8 // every file overlaps the probe
    t.setClusterBy(Seq("k"))
    t.cluster(targetFiles = 8)
    val files = t.manifest.get.files.size
    val hit = t.filesInRange("k", Some(100), Some(200)).size
    hit should be < files // ranges are now disjoint-ish
    t.readRange("k", Some(100), Some(200)).count() shouldBe
      t.read().filter("k >= 100 and k <= 200").count()
  }

  test("full recluster consolidates generations") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 500).map(i => (i % 97, i)).toDF("k", "v")
      .repartition(3))
    t.setClusterBy(Seq("k"))
    t.cluster()
    t.append((501 to 600).map(i => (i % 97, i)).toDF("k", "v").coalesce(1))
    t.cluster()
    val n = t.manifest.get.files.size
    t.cluster(full = true) shouldBe n
    t.read().count() shouldBe 600L
  }

  test("validation: unknown and partition columns rejected; no-decl cluster fails") {
    import spark.implicits._
    val t = ManagedTable(spark, tmp() + "/t")
    t.overwriteAll((1 to 50).map(i => (i, s"p${i % 3}")).toDF("k", "p"),
      partitionBy = Seq("p"))
    a[MetadataException] should be thrownBy t.setClusterBy(Seq("nope"))
    a[MetadataException] should be thrownBy t.setClusterBy(Seq("p"))
    a[MetadataException] should be thrownBy t.cluster()
    // the engine-maintained watermark is not user-settable
    t.setClusterBy(Seq("k"))
    a[MetadataException] should be thrownBy
      t.setTableProperties(Map(ManagedTable.ClusterVersionProp -> "7"))
    // CLUSTER BY NONE drops declaration and watermark
    t.clearClusterBy()
    t.clusterBy shouldBe Nil
    t.properties.contains(ManagedTable.ClusterVersionProp) shouldBe false
  }

  test("SQL: ALTER TABLE CLUSTER BY + plain OPTIMIZE runs the incremental pass") {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.functions.GraftSparkExtensions()(_))
      .getOrCreate()
    try {
      import s.implicits._
      val root = tmp() + "/t"
      val t = ManagedTable(s, root)
      t.overwriteAll((1 to 600).map(i => ((i * 7) % 600, i)).toDF("k", "v")
        .repartition(4))
      s.sql(s"ALTER TABLE graft.`$root` CLUSTER BY (k)")
      t.clusterBy shouldBe Seq("k")
      s.sql(s"OPTIMIZE graft.`$root`").collect()
      t.properties.contains(ManagedTable.ClusterVersionProp) shouldBe true
      t.read().count() shouldBe 600L
      // incremental through SQL too
      t.append((601 to 650).map(i => (i % 600, i)).toDF("k", "v").coalesce(1))
      val before = t.manifest.get.files.map(_.path).toSet
      s.sql(s"OPTIMIZE graft.`$root`").collect()
      (before -- t.manifest.get.files.map(_.path).toSet).size shouldBe 1
      s.sql(s"ALTER TABLE graft.`$root` CLUSTER BY NONE")
      t.clusterBy shouldBe Nil
    } finally {
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
