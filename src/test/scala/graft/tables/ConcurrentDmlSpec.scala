package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

/** Predicate-aware DML conflict resolution (Delta's write-serializable
  * rule): a DELETE/UPDATE that loses a commit race auto-rebases when the
  * winner provably did not intersect its read set — victims untouched AND
  * every winner-added file stats-disjoint from the predicate — and
  * surfaces [[ConcurrentWriteException]] for every real conflict.
  *
  * The races use the [[ManagedTable.onReplaceCommitAttempt]] seam: the
  * per-path lock is thread-reentrant, so the hook lands a competing
  * commit through a second table instance between the DML's manifest
  * read and its commit — the exact cross-process interleaving, made
  * deterministic. */
class ConcurrentDmlSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  def tmp(): String = Files.createTempDirectory("graft-conc-dml").toString

  private def ids(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  /** Arm the hook to fire `race` exactly once (the rebased second attempt
    * must not re-race), restoring the no-op afterwards. */
  private def raceOnce(t: ManagedTable)(race: => Unit): Unit = {
    t.onReplaceCommitAttempt = () => {
      t.onReplaceCommitAttempt = () => ()
      race
    }
  }

  test("DELETE rebases over a stats-disjoint concurrent append") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    t.append(ids(1000, 1100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(5000, 5100).coalesce(1)) } // ids ≥ 5000
    t.delete("id < 100") shouldBe 100L
    // both effects present: rival's rows survived, victims gone
    t.read().count() shouldBe 200L
    t.read().filter(col("id") < 100).count() shouldBe 0L
    t.read().filter(col("id") >= 5000).count() shouldBe 100L
    // delete landed ON TOP of the rival's commit
    t.currentVersion shouldBe Some(3L)
    t.history().head.operation shouldBe "delete"
  }

  test("DELETE conflicts when the winner appended possibly-matching rows") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(50, 60).coalesce(1)) } // inside id < 100
    val e = intercept[ConcurrentWriteException] { t.delete("id < 100") }
    e.getMessage should include("concurrent")
    // the loser swept its rewrite: table readable, rival's commit intact
    t.read().count() shouldBe 110L
    t.currentVersion shouldBe Some(1L)
  }

  test("DELETE conflicts when the winner touched a victim file") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    t.append(ids(1000, 1100).coalesce(1))
    val rival = ManagedTable(spark, root)
    // the rival's own DML rewrites the victim file (it matches id < 5)
    raceOnce(t) { rival.delete("id < 5") }
    intercept[ConcurrentWriteException] { t.delete("id < 100") }
    t.read().filter(col("id") < 100).count() shouldBe 95L // rival's effect only
  }

  test("UPDATE rebases over a stats-disjoint concurrent append") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(9000, 9010).coalesce(1)) }
    t.update(Map("v" -> "'upd'"), "id < 10") shouldBe 10L
    t.read().filter(col("v") === "upd").count() shouldBe 10L
    t.read().count() shouldBe 110L
    t.currentVersion shouldBe Some(2L)
  }

  test("stats-opaque predicate conservatively surfaces the conflict") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(5000, 5100).coalesce(1)) }
    // `id % 10 = 0` translates to no stats filter — the winner's adds
    // cannot be proven disjoint, so the conflict must surface even
    // though the rows genuinely don't overlap
    intercept[ConcurrentWriteException] { t.delete("id % 10 = 0") }
    t.read().count() shouldBe 200L
  }

  test("partition-scoped metadata DELETE rebases over an append to other partitions") {
    import spark.implicits._
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    val rows = (0 until 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "part")
    t.overwriteAll(rows, partitionBy = Seq("part"))
    val rival = ManagedTable(spark, root)
    raceOnce(t) {
      rival.append((200 until 210).map(i => (i.toLong, "b")).toDF("id", "part"))
    }
    t.delete("part = 'a'") shouldBe 50L
    t.read().count() shouldBe 60L
    t.read().filter(col("part") === "a").count() shouldBe 0L
  }

  test("partition-scoped metadata DELETE conflicts with an append INTO the dropped partition") {
    import spark.implicits._
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    val rows = (0 until 100).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "part")
    t.overwriteAll(rows, partitionBy = Seq("part"))
    val rival = ManagedTable(spark, root)
    raceOnce(t) {
      rival.append((200 until 210).map(i => (i.toLong, "a")).toDF("id", "part"))
    }
    intercept[ConcurrentWriteException] { t.delete("part = 'a'") }
    t.read().filter(col("part") === "a").count() shouldBe 60L
  }

  test("DELETE conflicts when the winner changed the schema") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    t.append(ids(1000, 1100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.addColumn("extra",
      org.apache.spark.sql.types.StringType) }
    intercept[ConcurrentWriteException] { t.delete("id < 100") }
  }

  test("replaceWhere rebases over a stats-disjoint concurrent append") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    t.append(ids(1000, 1100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(5000, 5100).coalesce(1)) }
    t.overwriteWhere(ids(0, 10).withColumn("v", lit("rw")), "id < 100")
    t.read().count() shouldBe 210L // 10 replaced + 100 + rival's 100
    t.read().filter(col("v") === "rw").count() shouldBe 10L
    t.currentVersion shouldBe Some(3L)
  }

  test("replaceWhere conflicts when the winner appended into the replaced region") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(50, 60).coalesce(1)) }
    intercept[ConcurrentWriteException] {
      t.overwriteWhere(ids(0, 10).withColumn("v", lit("rw")), "id < 100")
    }
    t.read().count() shouldBe 110L
  }

  test("MERGE keeps fail-fast on any interleaved commit") {
    val root = tmp() + "/t"
    val t = ManagedTable(spark, root)
    t.overwriteAll(ids(0, 100).coalesce(1))
    val rival = ManagedTable(spark, root)
    raceOnce(t) { rival.append(ids(5000, 5100).coalesce(1)) }
    intercept[ConcurrentWriteException] {
      MergeInto.byKey(t, ids(0, 10).withColumn("v", lit("m")), "id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    }
  }
}
