package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.ColumnOps

/** Property-based contracts (SURVEY §5: hash/normalization/merge-idempotence
  * properties via scalacheck generators; fixed seed for reproducibility). */
class PropertySpec extends AnyFunSuite with Matchers {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(42L)).get

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import spark.implicits._

  test("normalizeName is idempotent and strips the documented characters") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = ColumnOps.normalizeName(s)
      ColumnOps.normalizeName(once) shouldBe once
      once should not include " "
      once should not include "."
      once should not include "("
    }
  }

  test("sourceHash: stable, order-sensitive, null-vs-empty collision is contract") {
    val df = Seq(("a", "b"), ("b", "a")).toDF("x", "y")
    val h = df.select(ColumnOps.sourceHash(Seq("x", "y")).as("h"))
      .collect().map(_.getString(0))
    h(0) should not be h(1) // column ORDER is part of the hash

    // concat_ws skips nulls: (null,"ab") and ("ab",null) collide —
    // documented reference behavior, reproduced not fixed
    val n = Seq((Option.empty[String], Some("ab")), (Some("ab"), Option.empty[String]))
      .toDF("x", "y")
      .select(ColumnOps.sourceHash(Seq("x", "y")).as("h"))
      .collect().map(_.getString(0))
    n(0) shouldBe n(1)
  }

  test("merge is idempotent: re-merging the same slice only touches lastSeen") {
    import graft.tables.{ManagedTable, MergeInto}
    val t = ManagedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t")
    val data = Seq((1, "a"), (2, "b")).toDF("id", "v")
    t.overwriteAll(data)
    val m1 = MergeInto(t, data, "target.id = source.id")
      .whenMatchedUpdateAll(cond = Some("target.v != source.v"))
      .whenNotMatchedInsertAll()
      .execute()
    m1.count("m0") shouldBe 0 // nothing changed
    m1.count("nm1") shouldBe 0 // nothing new
    m1.count("unchanged") shouldBe 2
    t.read().count() shouldBe 2
  }

  test("salted join equals plain join") {
    val facts = Seq.tabulate(200)(i => (i % 3, s"f$i")).toDF("k", "fv")
    val dims = Seq((0, "x"), (1, "y"), (2, "z"), (7, "dead")).toDF("k", "dv")
    val plain = facts.join(dims, "k")
      .select("k", "fv", "dv").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewOps.saltedJoin(facts, dims, "k", salts = 8)
      .select("k", "fv", "dv").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2))).sorted
    salted shouldBe plain
  }

  test("salted distinct count equals plain distinct count") {
    val df = Seq.tabulate(500)(i => (i % 4, i % 37)).toDF("k", "v")
    val plain = df.groupBy("k").agg(countDistinct("v").as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedDistinctCount(df, col("k"), col("v"), salts = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    salted shouldBe plain
  }

  test("overwriteWhere ≡ (old where NOT pred) ∪ new, across random predicates") {
    import graft.tables.ManagedTable
    // deterministic pseudo-random rows + a predicate family: thresholds
    // over id, equality over the low-cardinality tag, and conjunctions —
    // for each, replaceWhere must land exactly (survivors ∪ replacement)
    val rows = samples(
      Gen.zip(Gen.choose(0, 999), Gen.oneOf("p", "q", "r")), 300)
      .zipWithIndex.map { case ((n, t), i) => (i, n, t) }
    val preds = Seq("n < 250", "tag = 'q'", "n >= 700 AND tag = 'p'",
      "n % 7 = 3", "false")
    preds.foreach { pred =>
      val t = ManagedTable(spark,
        java.nio.file.Files.createTempDirectory("graft-prop").toString + "/t")
      val df = rows.toDF("id", "n", "tag").repartition(4)
      t.overwriteAll(df)
      // an identity replacement (the matching rows themselves) always
      // satisfies the predicate, so the contract reduces to: the table
      // afterwards holds exactly survivors ∪ replacement
      val survivors = df.filter(s"NOT coalesce($pred, false)")
      val replacement = df.filter(pred)
      t.overwriteWhere(replacement, pred)
      val got = t.read().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
      val want = (survivors.collect() ++ replacement.collect())
        .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted
      got shouldBe want
    }
  }
}
