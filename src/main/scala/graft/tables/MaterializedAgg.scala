package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.metadata.MetadataException

/** Incrementally-maintained aggregate table (a materialized view) over a
  * source [[ManagedTable]]'s change feed — the "keep a 100 TB rollup
  * fresh without rescanning it" primitive.
  *
  * The view is `SELECT keys…, count(*) AS cnt, sum(c) AS sum_c… FROM
  * source GROUP BY keys…`, stored as its own managed table. [[refresh]]
  * reads only the source rows that CHANGED since the last refresh
  * ([[ManagedTable.changes]], the raw file-diff feed — O(changed files),
  * not O(table)), folds them into per-group deltas (+1/+x for rows in
  * added files, −1/−x for rows in removed files), and applies the deltas
  * in ONE keyed MERGE that rewrites only view files containing touched
  * groups. Linear aggregates need NO key netting: a rewritten file's
  * carried-over rows appear on both sides of the diff and cancel
  * exactly, updates telescope to their net movement. End-to-end work is
  * O(changed rows), however large the source or the view.
  *
  * Exactly-once: the synced source version rides the merge commit as a
  * writer transaction ([[MergeBuilder.withTxn]] — atomic with the data,
  * exactly like the streaming sink), so a crash between "deltas applied"
  * and "bookmark stored" replays into a no-op, never a double-count.
  * Recovery takes the max of the txn marker and the newest
  * record-embedded txn, the same contract the streaming sink uses.
  *
  * `count(*)` and `sum` are maintained by DELTA FOLD (avg = sum/cnt at
  * read time). `sum` treats NULL as 0 (a group whose values are all NULL
  * reports 0, where a full recompute reports NULL) — use integer/decimal
  * columns for exact maintenance; floating-point sums drift by
  * reassociation exactly as any distributed sum does.
  *
  * `min`/`max` aggregates switch the refresh to RECOMPUTE-TOUCHED-GROUPS:
  * a delete of the current extremum cannot be folded (the new extremum
  * is not in the delta), so the refresh takes the interval's distinct
  * group keys and re-aggregates ONLY those groups from the current
  * source — a semi-join-pruned scan, bounded when the source is
  * partitioned or [[ManagedTable.setClusterBy]]-clustered on the group
  * key, which is exactly how a 100 TB table should be laid out for this
  * view. Untouched groups' rows are never read and never rewritten; a
  * group whose rows all vanished is deleted from the view.
  *
  * `sourceKey` must uniquely identify source rows (the table PK). The
  * linear-fold path never nets by it (exact regardless), but the min/max
  * recompute path and downstream CDC consumers rely on it.
  */
final class MaterializedAgg(
    spark: SparkSession,
    source: ManagedTable,
    val view: ManagedTable,
    sourceKeys: Seq[String],
    keys: Seq[String],
    sums: Seq[String],
    mins: Seq[String] = Nil,
    maxs: Seq[String] = Nil) {

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

  /** Continuous maintenance: a Structured Streaming query over the
    * source's change feed whose only job is to call [[refresh]] once
    * per micro-batch — the feed is the TRIGGER (a batch arrives exactly
    * when the source commits), while the refresh itself re-reads the
    * interval through its own exactly-once bookmark, so a crash or
    * replayed batch folds into a no-op, never a double-count. Stop the
    * returned query to stop maintenance; the view stays consistent at
    * whatever version it last synced. */
  def maintainStream(checkpointLocation: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("10 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(source.rootPath)
      .writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) => refresh(); () }
      .start()

  /** Test seam: fires after the (anchor, cur) reads and before the
    * delta computes/commits — the window a rival refresh can land in.
    * The commit-time anchor fence (expectedPrev) closes it. */
  private[tables] var onAnchorRead: () => Unit = () => ()

  /** Bring the view up to the source's current version. First call
    * builds it with one full aggregate; later calls fold only the
    * changed rows in. Returns the source version now reflected. */
  def refresh(): Long = {
    val cur = source.currentVersion.getOrElse(throw new MetadataException(
      s"materialized aggregate over missing table ${source.rootPath}"))
    val anchor = syncedVersion
    onAnchorRead()
    // every txn fences on the anchor it was derived from (−1 = none):
    // a rival refresh landing between the reads above and the commit
    // below surfaces as a conflict, never a re-folded overlap
    val fence = Some(anchor.getOrElse(-1L))
    anchor match {
      case Some(v) if v == cur => cur
      // the synced anchor fell below the source's vacuum horizon — the
      // incremental interval is no longer diffable, but a view is always
      // recomputable: fall back to one full rebuild (same txn contract)
      // instead of wedging every future refresh on a MetadataException
      case Some(v) if source.earliestReadableVersion.exists(v < _) =>
        view.overwriteAll(aggregate(source.read()), Nil, "matview-rebuild",
          txn = Some(Txn(appId, cur, fence)))
        cur
      case None =>
        view.overwriteAll(aggregate(source.read()), Nil, "matview-build",
          txn = Some(Txn(appId, cur, fence)))
        describeSelf()
        cur
      case Some(v) =>
        if (mins.isEmpty && maxs.isEmpty)
          // count/sum are LINEAR, so the delta folds from the RAW file
          // diff feed — added rows +, removed rows − — with no key
          // netting at all: a rewritten file's carried-over rows appear
          // on both sides and cancel exactly, updates telescope to their
          // net movement, and the fold equals aggregate(to) −
          // aggregate(from) by construction. Skipping rowChanges drops
          // the full-outer netting join + preimage explode from every
          // refresh (the interval's dominant plan cost); it also means
          // no PK-uniqueness guard runs here — linear folds are exact
          // even under duplicate keys, so none is needed
          applyDelta(source.changes(v, cur), cur, v)
        else
          // the recompute path needs only the touched GROUP KEYS, so it
          // reads the raw file-diff feed: no key-netting full-outer
          // join, no dup probe, no preimage explode — cheaper per
          // refresh, identical touched set
          recomputeTouched(source.changes(v, cur), cur, v)
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
      MaterializedAgg.SumsProp -> sums.mkString(","),
      MaterializedAgg.MinsProp -> mins.mkString(","),
      MaterializedAgg.MaxsProp -> maxs.mkString(","))
    if (view.properties.filter { case (k, _) => want.contains(k) } != want)
      view.setTableProperties(want)
  }

  private def cntCol = "cnt"
  private def sumCol(c: String) = s"sum_$c"
  private def minCol(c: String) = s"min_$c"
  private def maxCol(c: String) = s"max_$c"
  private def aggCols: Seq[String] = (cntCol +: sums.map(sumCol)) ++
    mins.map(minCol) ++ maxs.map(maxCol)

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as(cntCol),
        sums.map(c => sum(coalesce(col(s"`$c`"), lit(0))).as(sumCol(c))) ++
          mins.map(c => min(col(s"`$c`")).as(minCol(c))) ++
          maxs.map(c => max(col(s"`$c`")).as(maxCol(c))): _*)

  /** min/max refresh: re-aggregate ONLY the groups the interval
    * touched, replace their view rows in one keyed merge, delete
    * groups that emptied. The source scan is semi-join-pruned to
    * touched groups — partition/cluster the source by the group key to
    * bound it. */
  private def recomputeTouched(changed: DataFrame, cur: Long,
      anchor: Long): Unit = {
    val keyC = keys.map(c => col(s"`$c`"))
    val real = "__real"
    val (msrc, h) = graft.ops.SubstrateCache.scoped {
      // ONE aggregation yields both the recompute and the emptied-group
      // marker: live source rows of touched groups (semi-join-pruned,
      // tagged 1) unioned with a PHANTOM row per changed row (tagged 0,
      // null values). `cnt = sum(tag)` counts only live rows, extrema
      // ignore the phantom nulls, and a group whose rows all vanished
      // still surfaces — with cnt 0 — through its phantoms. Duplicate
      // keys are harmless everywhere (phantoms add 0), so the feed needs
      // NO distinct shuffle and the recompute joins NOTHING back: plan is
      // semi-join → union → one shuffle. Join strategy is left to AQE —
      // a slice-sized feed broadcasts, a huge backfill interval degrades
      // to a shuffle join, never to all-pairs.
      val touchedKeys = changed.select(keyC: _*)
      val valued = source.read()
        .join(touchedKeys, keys, "left_semi")
        .select(keyC ++ Seq(lit(1L).as(real)) ++
          (sums ++ mins ++ maxs).distinct.map(c => col(s"`$c`")): _*)
      val phantoms = touchedKeys
        .select(keyC ++ Seq(lit(0L).as(real)) ++
          (sums ++ mins ++ maxs).distinct.map(c =>
            lit(null).cast(source.read().schema(c).dataType).as(c)): _*)
      graft.ops.SubstrateCache.persist(
        valued.unionByName(phantoms)
          .groupBy(keyC: _*)
          .agg(sum(col(real)).as(cntCol),
            sums.map(c => sum(coalesce(col(s"`$c`"), lit(0))).as(sumCol(c))) ++
              mins.map(c => min(col(s"`$c`")).as(minCol(c))) ++
              maxs.map(c => max(col(s"`$c`")).as(maxCol(c))): _*))
    }
    try {
      val cond = keys.map(c => s"target.`$c` = source.`$c`").mkString(" AND ")
      val b =
        (if (keys.size == 1) MergeInto.byKey(view, msrc, keys.head)
         else MergeInto(view, msrc, cond))
          // msrc is one row per touched group key — the multi-match
          // guard's extra job would verify a tautology
          .assumeUniqueSourceKeys()
      b.whenMatchedDelete(Some(s"source.`$cntCol` = 0"))
        .whenMatchedUpdate(
          aggCols.map(c => c -> s"source.`$c`").toMap)
        .whenNotMatchedInsert(
          (keys ++ aggCols).map(c => c -> s"source.`$c`").toMap,
          cond = Some(s"source.`$cntCol` <> 0"))
        .withTxn(appId, cur, operation = "matview-refresh",
          expectedPrev = Some(anchor))
        .execute()
      ()
    } finally h.release()
  }

  /** Fold the RAW file-diff feed ([[ManagedTable.changes]]:
    * `_change_type` added/removed) into per-group deltas and merge them
    * into the view. */
  private def applyDelta(changed: DataFrame, cur: Long,
      anchor: Long): Unit = {
    val sign = when(col("_change_type") === "added", 1).otherwise(-1)
    val viewSchema = view.read().schema
    def typed(name: String, c: Column): Column =
      c.cast(viewSchema(name).dataType).as(s"__d_$name")
    // the delta is per-GROUP (small) while its lineage is the interval's
    // diff aggregation (the expensive part) — persist it so the merge's
    // touch-detect probe and its write materialize the diff ONCE, not
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
        (if (keys.size == 1) MergeInto.byKey(view, delta, keys.head)
         else MergeInto(view, delta, cond))
          // the delta is a groupBy-keys output — one row per group
          .assumeUniqueSourceKeys()
      b.whenMatchedDelete(
          Some(s"target.`$cntCol` + source.`__d_$cntCol` = 0"))
        .whenMatchedUpdate(updates)
        .whenNotMatchedInsert(inserts)
        .withTxn(appId, cur, operation = "matview-refresh",
          expectedPrev = Some(anchor))
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
  val MinsProp = "graft.matview.mins"
  val MaxsProp = "graft.matview.maxs"

  /** View over `source` stored at `viewRoot`, maintained from changes
    * keyed by `sourceKey` (the source PK), grouped by `keys`, summing
    * `sums`, tracking extrema of `mins`/`maxs`. Call
    * [[MaterializedAgg.refresh]] to (re)build/advance. */
  def apply(spark: SparkSession, source: ManagedTable, viewRoot: String,
      sourceKey: String, keys: Seq[String], sums: Seq[String],
      mins: Seq[String], maxs: Seq[String]): MaterializedAgg =
    new MaterializedAgg(spark, source, ManagedTable(spark, viewRoot),
      sourceKey.split(",").map(_.trim).filter(_.nonEmpty).toSeq, keys, sums,
      mins, maxs)

  def apply(spark: SparkSession, source: ManagedTable, viewRoot: String,
      sourceKey: String, keys: Seq[String],
      sums: Seq[String]): MaterializedAgg =
    apply(spark, source, viewRoot, sourceKey, keys, sums, Nil, Nil)

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
    def opt(k: String): Seq[String] =
      props.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
    new MaterializedAgg(spark, ManagedTable(spark, req(SourceProp)), view,
      list(SourceKeysProp), list(KeysProp), opt(SumsProp),
      opt(MinsProp), opt(MaxsProp))
  }

  /** Txn appIds are filenames — derive a safe, collision-resistant one
    * from the view's root path. */
  private[tables] def txnAppId(viewRoot: String): String =
    "matview-" + java.security.MessageDigest.getInstance("SHA-256")
      .digest(viewRoot.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
}
