package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metadata.MetadataException

/** Incrementally-maintained aggregate table (a materialized view) over a
  * source [[ManagedTable]]'s row-level change feed — the "keep a 100 TB
  * rollup fresh without rescanning it" primitive.
  *
  * The view is `SELECT keys…, count(*) AS cnt, sum(c) AS sum_c… FROM
  * source GROUP BY keys…`, stored as its own managed table. [[refresh]]
  * reads only the source rows that CHANGED since the last refresh
  * ([[ManagedTable.rowChanges]] with preimages — O(changed files), not
  * O(table)), folds them into per-group deltas (+1/+x for inserts and
  * update postimages, −1/−x for deletes and update preimages), and
  * applies the deltas in ONE keyed MERGE that rewrites only view files
  * containing touched groups. End-to-end work is O(changed rows), however
  * large the source or the view.
  *
  * Exactly-once: the synced source version rides the merge commit as a
  * writer transaction ([[MergeBuilder.withTxn]] — atomic with the data,
  * exactly like the streaming sink), so a crash between "deltas applied"
  * and "bookmark stored" replays into a no-op, never a double-count.
  * Recovery takes the max of the txn marker and the newest
  * record-embedded txn, the same contract the streaming sink uses.
  *
  * Only self-maintainable aggregates are offered: `count(*)` and `sum`
  * (avg = sum/cnt at read time). `min`/`max` are NOT — a delete of the
  * current extremum forces a group rescan, which is a different
  * (recompute-touched-groups) algorithm, not a delta fold. `sum` treats
  * NULL as 0 (a group whose values are all NULL reports 0, where a full
  * recompute reports NULL) — use integer/decimal columns for exact
  * maintenance; floating-point sums drift by reassociation exactly as
  * any distributed sum does.
  *
  * `sourceKey` must uniquely identify source rows (the table PK) — it is
  * what [[ManagedTable.rowChanges]] nets endpoint images by.
  */
final class MaterializedAgg(
    spark: SparkSession,
    source: ManagedTable,
    val view: ManagedTable,
    sourceKeys: Seq[String],
    keys: Seq[String],
    sums: Seq[String]) {

  require(keys.nonEmpty, "materialized aggregate needs at least one group key")
  require(sourceKeys.nonEmpty, "materialized aggregate needs the source PK")

  private val appId = MaterializedAgg.txnAppId(view.rootPath)

  /** Source version the view currently reflects; None before the first
    * [[refresh]]. Crash-safe (see class doc). */
  def syncedVersion: Option[Long] =
    if (!view.exists) None
    else (view.getTxn(appId) ++ view.newestRecordTxn(appId))
      .reduceOption(_ max _)

  /** The maintained aggregate, one row per live group. */
  def read(): DataFrame = view.read()

  /** Bring the view up to the source's current version. First call
    * builds it with one full aggregate; later calls fold only the
    * changed rows in. Returns the source version now reflected. */
  def refresh(): Long = {
    val cur = source.currentVersion.getOrElse(throw new MetadataException(
      s"materialized aggregate over missing table ${source.rootPath}"))
    syncedVersion match {
      case Some(v) if v == cur => cur
      case None =>
        view.overwriteAll(aggregate(source.read()), Nil, "matview-build",
          txn = Some(Txn(appId, cur)))
        describeSelf()
        cur
      case Some(v) =>
        val changed = source.rowChanges(v, cur, sourceKeys,
          includePreimages = true)
        applyDelta(changed, cur)
        cur
    }
  }

  /** Record the view's definition as table properties so
    * [[MaterializedAgg.forView]] (and `REFRESH MATERIALIZED VIEW`) can
    * reconstruct it from the view alone. Idempotent; re-run after the
    * build commit, so a crash between the two self-heals on the next
    * [[refresh]] through the construction parameters. */
  private def describeSelf(): Unit = {
    val want = Map(
      MaterializedAgg.SourceProp -> source.rootPath,
      MaterializedAgg.SourceKeysProp -> sourceKeys.mkString(","),
      MaterializedAgg.KeysProp -> keys.mkString(","),
      MaterializedAgg.SumsProp -> sums.mkString(","))
    if (view.properties.filter { case (k, _) => want.contains(k) } != want)
      view.setTableProperties(want)
  }

  private def cntCol = "cnt"
  private def sumCol(c: String) = s"sum_$c"

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as(cntCol),
        sums.map(c => sum(coalesce(col(s"`$c`"), lit(0))).as(sumCol(c))): _*)

  private def applyDelta(changed: DataFrame, cur: Long): Unit = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), 1)
      .otherwise(-1)
    val viewSchema = view.read().schema
    def typed(name: String, c: Column): Column =
      c.cast(viewSchema(name).dataType).as(s"__d_$name")
    // the delta is per-GROUP (small) while its lineage is the interval's
    // diff join (the expensive part) — persist it so the merge's
    // touch-detect probe and its write materialize the join ONCE, not
    // once per downstream action
    val (delta, h) = graft.ops.SubstrateCache.scoped {
      graft.ops.SubstrateCache.persist(changed
        .groupBy(keys.map(c => col(s"`$c`")): _*)
        .agg(typed(cntCol, sum(sign)),
          sums.map(c =>
            typed(sumCol(c), sum(sign * coalesce(col(s"`$c`"), lit(0))))): _*)
        // zero-net groups (an update that moved no value) have nothing to
        // apply — dropping them keeps the merge's touch set minimal
        .filter(col(s"`__d_$cntCol`") =!= 0 ||
          sums.map(c => col(s"`__d_${sumCol(c)}`") =!= 0)
            .foldLeft(lit(false))(_ || _)))
    }
    try {
      val cond = keys.map(c => s"target.`$c` = source.`$c`").mkString(" AND ")
      val updates = (cntCol +: sums.map(sumCol)).map(c =>
        c -> s"target.`$c` + source.`__d_$c`").toMap
      val inserts = keys.map(c => c -> s"source.`$c`").toMap ++
        (cntCol +: sums.map(sumCol)).map(c => c -> s"source.`__d_$c`")
      val b =
        if (keys.size == 1) MergeInto.byKey(view, delta, keys.head)
        else MergeInto(view, delta, cond)
      b.whenMatchedDelete(
          Some(s"target.`$cntCol` + source.`__d_$cntCol` = 0"))
        .whenMatchedUpdate(updates)
        .whenNotMatchedInsert(inserts)
        .withTxn(appId, cur, operation = "matview-refresh")
        .execute()
      ()
    } finally h.release()
  }
}

object MaterializedAgg {

  /** The view table properties a built view describes itself with —
    * what lets `REFRESH MATERIALIZED VIEW` run from the view alone. */
  val SourceProp = "graft.matview.source"
  val SourceKeysProp = "graft.matview.sourceKeys"
  val KeysProp = "graft.matview.keys"
  val SumsProp = "graft.matview.sums"

  /** View over `source` stored at `viewRoot`, maintained from changes
    * keyed by `sourceKey` (the source PK), grouped by `keys`, summing
    * `sums`. Call [[MaterializedAgg.refresh]] to (re)build/advance. */
  def apply(spark: SparkSession, source: ManagedTable, viewRoot: String,
      sourceKey: String, keys: Seq[String],
      sums: Seq[String]): MaterializedAgg =
    new MaterializedAgg(spark, source, ManagedTable(spark, viewRoot),
      sourceKey.split(",").map(_.trim).filter(_.nonEmpty).toSeq, keys, sums)

  def apply(spark: SparkSession, source: ManagedTable, viewRoot: String,
      sourceKey: String, keys: Seq[String]): MaterializedAgg =
    apply(spark, source, viewRoot, sourceKey, keys, Nil)

  /** Reconstruct a maintained view from its own self-description — the
    * REFRESH-by-name path. Fails with the missing property named when
    * the table was not built by [[MaterializedAgg]]. */
  def forView(spark: SparkSession, view: ManagedTable): MaterializedAgg = {
    val props = view.properties
    def req(k: String): String = props.getOrElse(k, throw new MetadataException(
      s"${view.rootPath} is not a materialized aggregate view " +
        s"(missing table property $k)"))
    def list(k: String): Seq[String] =
      req(k).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    new MaterializedAgg(spark, ManagedTable(spark, req(SourceProp)), view,
      list(SourceKeysProp), list(KeysProp),
      props.get(SumsProp).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil))
  }

  /** Txn appIds are filenames — derive a safe, collision-resistant one
    * from the view's root path. */
  private[tables] def txnAppId(viewRoot: String): String =
    "matview-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(viewRoot.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
}
