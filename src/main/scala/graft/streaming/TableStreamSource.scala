package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.metadata.MetadataException
import graft.tables.{ManagedTable, TableFile}

/** Structured Streaming SOURCE over a [[ManagedTable]] — the managed
  * table becomes a live feed, completing the lakehouse streaming story
  * (the engine already streams INTO tables via `StreamingIngest`; this
  * streams OUT of them). Delta's streaming-source equivalent on the
  * manifest layer:
  *
  *  - offsets are `(version, fileIndex)` pairs ([[GraftSourceOffset]]),
  *    so progress tracking rides the commit protocol AND a single huge
  *    commit can be consumed across several micro-batches: a micro-batch
  *    is "the next slice of files", resolved from manifest diffs —
  *    O(changed files), never a directory listing, and exactly-once
  *    because version commits are atomic pointer swaps;
  *  - `maxFilesPerTrigger` / `maxBytesPerTrigger` (plain numbers, or
  *    `k`/`m`/`g` suffixed for bytes) bound per-batch admission —
  *    Delta's streaming-read contract. This applies to the INITIAL
  *    SNAPSHOT too: a stream started against a 100 TB table drains the
  *    snapshot in bounded batches instead of one un-checkpointable
  *    mega-batch. Files are priced from manifest-recorded sizes
  *    ([[TableFile.bytes]]); a legacy entry without one costs a single
  *    status RPC. At least one file is always admitted, so a file larger
  *    than `maxBytesPerTrigger` cannot stall the stream;
  *  - REWRITTEN files re-emit their rows (Delta `ignoreChanges`
  *    semantics): downstream consumers of a merge-maintained table must
  *    dedupe by key — or set `changeFeed=true` to stream the classified
  *    row-level feed instead ([[ChangeFeedStreamSource]]). Appends
  *    re-emit nothing;
  *  - the column set is pinned at stream start: schema evolution
  *    mid-stream null-fills columns a later version dropped and casts
  *    widened columns back to the declared type, rather than reshaping
  *    the plan (each version's files are read under THAT version's
  *    schema, then projected).
  *
  * Legacy checkpoints (older streams bookmarked bare `LongOffset`
  * versions) restore as "version fully emitted" and continue.
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format(classOf[TableStreamProvider].getName)
  *     .option("path", tableRoot)
  *     .option("maxFilesPerTrigger", "100")      // optional
  *     .option("maxBytesPerTrigger", "1g")       // optional
  *     .option("skipChangeCommits", "true")      // optional: appends only
  *     .option("startingVersion", "0")           // optional: no snapshot
  *     .option("startingTimestamp", "2026-01-01")// optional: no snapshot
  *     .load()
  * }}}
  */
class TableStreamProvider extends StreamSourceProvider {

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft table stream source requires option 'path'"))

  private def tableSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      parameters: Map[String, String]): StructType =
    schema.getOrElse(
      ManagedTable(sqlContext.sparkSession, path(parameters)).manifest
        .map(_.schema)
        .getOrElse(throw new IllegalArgumentException(
          s"graft table stream source: no table at ${path(parameters)}")))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = tableSchema(sqlContext, schema, parameters)
    if (ChangeFeedStreamSource.enabled(parameters))
      ("graft-table-changes", ChangeFeedStreamSource.feedSchema(base))
    else ("graft-table", base)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val base = tableSchema(sqlContext, schema, parameters)
    if (ChangeFeedStreamSource.enabled(parameters))
      new ChangeFeedStreamSource(sqlContext, path(parameters), base, parameters)
    else
      new TableStreamSource(sqlContext, path(parameters), base, parameters)
  }
}

/** Offset into a managed table's commit stream: files of `version`'s
  * list with index ≤ `index` are emitted (−1: none yet), plus every
  * earlier version in full. `isInitial` marks the stream's initial
  * snapshot version, whose "list" is the FULL file set at that version
  * (Delta's `isStartingVersion`); later versions' lists are the files
  * the version ADDED (manifest diff). Self-describing, so `getBatch`
  * needs no side state to interpret a checkpointed interval.
  *
  * `listSize` records the length of `version`'s list AS THIS OFFSET SAW
  * IT — the list-identity fingerprint. A manifest-diff list silently
  * becomes the (longer) full-snapshot list when vacuum moves the
  * horizon to exactly `version`; a resumed mid-list index would then
  * slice a DIFFERENT list, re-emitting delivered files and/or skipping
  * undelivered ones. With the fingerprint, "fully emitted"
  * (`index ≥ listSize − 1`) survives the swap exactly, and a genuine
  * mid-list resume whose list changed fails LOUDLY instead. None on
  * offsets restored from pre-fingerprint checkpoints. */
final case class GraftSourceOffset(version: Long, index: Long,
    isInitial: Boolean, listSize: Option[Long] = None)
    extends Offset {
  /** True when the recorded fingerprint proves every file of `version`'s
    * list was emitted (the legacy `Long.MaxValue` sentinel also counts). */
  def fullyEmitted: Boolean =
    index == Long.MaxValue || listSize.exists(sz => index >= sz - 1)
  override def json: String =
    s"""{"version":$version,"index":$index,"isInitial":$isInitial""" +
      listSize.fold("")(sz => s""","listSize":$sz""") + "}"
}

object GraftSourceOffset {
  /** Parse an offset: ours, or a legacy bare-version `LongOffset` json
    * (old checkpoints) meaning "version fully emitted, post-snapshot". */
  def fromJson(j: String): GraftSourceOffset = {
    val s = j.trim
    if (s.forall(c => c.isDigit || c == '-'))
      GraftSourceOffset(s.toLong, Long.MaxValue, isInitial = false)
    else {
      val p = org.json4s.jackson.JsonMethods.parse(s)
      import org.json4s._
      def lng(v: JValue): Long = v match {
        case JLong(x) => x; case JInt(x) => x.toLong; case _ => 0L
      }
      GraftSourceOffset(lng(p \ "version"), lng(p \ "index"),
        (p \ "isInitial") match { case JBool(b) => b; case _ => false },
        (p \ "listSize") match {
          case JLong(x) => Some(x); case JInt(x) => Some(x.toLong)
          case _        => None
        })
    }
  }

  def of(o: org.apache.spark.sql.connector.read.streaming.Offset): GraftSourceOffset =
    o match {
      case g: GraftSourceOffset => g
      case other                => fromJson(other.json)
    }
}

class TableStreamSource(
    sqlContext: SQLContext,
    path: String,
    declaredSchema: StructType,
    parameters: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}

  private val table = ManagedTable(sqlContext.sparkSession, path)

  private val maxFiles: Option[Int] =
    parameters.get("maxFilesPerTrigger").map { s =>
      val n = s.trim.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
  private val maxBytes: Option[Long] =
    parameters.get("maxBytesPerTrigger").map(TableStreamSource.parseBytes)

  /** Delta's `skipChangeCommits`: a commit that removed or re-masked any
    * existing file is a CHANGE commit (merge/update/delete/compaction) —
    * emit nothing from it, so downstream sees appends only and never a
    * re-emitted row. Pure-append commits still flow. Default false =
    * re-emit rewritten files (Delta `ignoreChanges` semantics, consumers
    * dedupe by key). */
  private val skipChangeCommits: Boolean =
    parameters.get("skipChangeCommits").exists(_.trim.toBoolean)

  /** Delta's `startingVersion` / `startingTimestamp` on the table
    * source: skip the initial snapshot and stream file additions from a
    * version onward — `0` replays every commit, `latest` only commits
    * after stream start, a timestamp the first retained commit at or
    * after the instant. Without either, the stream begins with the full
    * snapshot (Delta's default). */
  private val startingVersionOpt: Option[String] =
    parameters.get("startingVersion").map { s =>
      if (!s.equalsIgnoreCase("latest"))
        require(s.trim.toLong >= 0,
          s"startingVersion must be >= 0 or 'latest', got $s")
      s.trim
    }
  private val startingTimestamp: Option[Long] =
    parameters.get("startingTimestamp").map(ChangeFeedStreamSource.parseTs)
  require(startingVersionOpt.isEmpty || startingTimestamp.isEmpty,
    "graft table stream source: startingVersion and startingTimestamp " +
      "are mutually exclusive")
  private def hasStartingSpec: Boolean =
    startingVersionOpt.isDefined || startingTimestamp.isDefined

  /** Exclusive from-version of the stream's first batch (the snapshot
    * surrogate), frozen at first resolution. `latest` anchors to the
    * head at STREAM START; on a batch-0 replay after restart the
    * in-memory anchor is gone, but a `latest` first batch is always
    * empty, so re-anchoring to the replayed end offset's version is
    * exact, and the version/timestamp forms recompute deterministically
    * from their parameters. */
  private var anchor: Option[Long] = None

  private def resolveAnchor(head: Long): Long = anchor.getOrElse {
    val f = startingVersionOpt match {
      case Some(s) if s.equalsIgnoreCase("latest") => head
      case Some(s) =>
        val v = s.toLong
        guardHorizon(v)
        v - 1L
      case None =>
        // first retained commit at or after the instant; none → only
        // commits after the current head (the `latest` behavior)
        table.history().filter(_.timestampMs >= startingTimestamp.get)
          .map(_.version).minOption.getOrElse(head + 1L) - 1L
    }
    anchor = Some(f)
    f
  }

  /** The stream's first offset: the initial-snapshot marker, or — with a
    * starting spec — "anchor version fully emitted", so the walk resumes
    * with the next commit's file additions. */
  private def startOffset(head: Long): GraftSourceOffset =
    if (!hasStartingSpec) GraftSourceOffset(head, -1L, isInitial = true)
    else GraftSourceOffset(resolveAnchor(head), Long.MaxValue,
      isInitial = false)

  /** Position of the last offset this source offered or served — the
    * legacy `getOffset` path continues from here. The engine itself
    * drives this source through [[latestOffset]] (it implements
    * `SupportsAdmissionControl`), where Spark supplies the checkpointed
    * start offset every trigger and no internal position is needed. */
  private var position: Option[GraftSourceOffset] = None

  /** Head version frozen by [[prepareForTriggerAvailableNow]]:
    * `Trigger.AvailableNow` drains up to here in bounded batches, then
    * stops — commits racing in after the trigger started are left for
    * the next run. */
  @volatile private var availableNowCap: Option[Long] = None

  override def schema: StructType = declaredSchema

  /** Spark's admission-control entry (preferred over [[getOffset]]):
    * the engine passes the previous end offset from its own
    * checkpointed state, so restarts need no source-side recovery. The
    * passed `limit` mirrors [[getDefaultReadLimit]]; the walk applies
    * this source's configured budgets directly. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val headRaw = table.currentVersion.getOrElse(return null)
    val head = availableNowCap.fold(headRaw)(math.min(_, headRaw))
    val from = Option(start).map(GraftSourceOffset.of)
    from.foreach(f => guardHorizon(f.version))
    val next = advance(from.getOrElse(startOffset(head)), head)
    // unchanged position → return the caller's own offset: equal offsets
    // mean "no new data" (a legacy clamped offset normalizes through one
    // empty batch instead)
    if (from.contains(next)) start else next
  }

  override def getDefaultReadLimit: ReadLimit = {
    val limits = maxFiles.map(ReadLimit.maxFiles).toSeq ++
      maxBytes.map(ReadLimit.maxBytes).toSeq
    limits match {
      case Nil      => ReadLimit.allAvailable()
      case Seq(one) => one
      case many     => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Unthrottled head, for progress reporting (how far behind the
    * admitted offset is). */
  override def reportLatestOffset(): OffsetV2 =
    table.currentVersion
      .map(v => GraftSourceOffset(v, Long.MaxValue, isInitial = false))
      .orNull

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion

  private def belowHorizon(version: Long): Boolean =
    version < 0L || table.earliestReadableVersion.exists(version < _)

  /** Files "of" a version: the full snapshot for the stream's initial
    * version, the manifest-diff additions otherwise. Order is the
    * manifest's file order — stable, because records are immutable.
    *
    * A version whose PREDECESSOR was vacuumed past (the natural
    * `startingVersion` after retention pruning is the horizon itself)
    * replays from its own record: the full file set at that version is
    * its "additions" — Delta replays commit `s` from its own log entry
    * without needing `s-1`. A version itself below the horizon is only
    * ever referenced as a fully-emitted anchor; its list is never
    * sliced, so empty is exact. */
  private def listFor(version: Long, isInitial: Boolean): Seq[TableFile] =
    if (belowHorizon(version)) Nil
    else if (isInitial || version == 0L) table.readManifest(version).files
    else if (belowHorizon(version - 1)) table.readManifest(version).files
    else {
      // file identity is (path, deletion-vector): a DV commit keeps the
      // path but re-masks rows, and re-emits like any rewritten file
      val prev = table.readManifest(version - 1).files
        .map(f => (f.path, f.dv)).toSet
      val cur = table.readManifest(version).files
      if (skipChangeCommits) {
        val curSet = cur.map(f => (f.path, f.dv)).toSet
        if (prev.exists(p => !curSet.contains(p))) return Nil
      }
      cur.filterNot(f => prev.contains((f.path, f.dv)))
    }

  private def priced(f: TableFile): Long =
    f.bytes.getOrElse(table.fileLen(f.path))

  override def getOffset: Option[Offset] = {
    val head = table.currentVersion.getOrElse(return position)
    guardHorizon(position.map(_.version).getOrElse(head))
    val next = position match {
      case None =>
        // fresh stream: the initial snapshot (or starting-spec anchor)
        advance(startOffset(head), head)
      case Some(p) => advance(p, head)
    }
    if (position.contains(next)) position // no new files → no batch
    else { position = Some(next); Some(next) }
  }

  /** Walk forward from `from` admitting files until the per-trigger
    * budget is exhausted or `head` is drained. Always admits at least
    * one file when any is available. With no limits configured this
    * jumps straight to the head version's full list. */
  private def advance(from: GraftSourceOffset, head: Long): GraftSourceOffset = {
    guardResume(from)
    var v = from.version
    var i =
      if (from.fullyEmitted) listFor(v, from.isInitial).size - 1L
      else math.min(from.index, listFor(v, from.isInitial).size - 1L)
    var initial = from.isInitial
    def at(version: Long, idx: Long, init: Boolean): GraftSourceOffset =
      GraftSourceOffset(version, idx, init,
        Some(listFor(version, init).size.toLong))
    if (maxFiles.isEmpty && maxBytes.isEmpty) {
      // unlimited: drain everything up to head (but finish an in-flight
      // initial snapshot at its own version first — its list type differs)
      if (initial && i < listFor(v, initial).size - 1L)
        return at(v, listFor(v, initial).size - 1L, initial)
      if (v >= head) return at(v, i, initial)
      return at(head, listFor(head, isInitial = false).size - 1L,
        init = false)
    }
    var files = 0
    var bytes = 0L
    var done = false
    while (!done) {
      val list = listFor(v, initial)
      while (!done && i + 1 < list.size) {
        val cost = if (maxBytes.isDefined) priced(list((i + 1).toInt)) else 0L
        val over = maxFiles.exists(files + 1 > _) ||
          maxBytes.exists(bytes + cost > _)
        if (over && files > 0) done = true
        else { i += 1; files += 1; bytes += cost }
      }
      if (!done) {
        if (v >= head || maxFiles.exists(files >= _) ||
            maxBytes.exists(bytes >= _)) done = true
        else { v += 1; i = -1L; initial = false }
      }
    }
    at(v, i, initial)
  }

  private def guardHorizon(version: Long): Unit =
    table.earliestReadableVersion.foreach(e =>
      if (version < e) throw new MetadataException(
        s"Streaming read of $path from version $version: vacuumed " +
          s"(earliest readable version is $e)"))

  /** Mid-version resume guard: an offset that stopped INSIDE `version`'s
    * list can only continue against the IDENTICAL list. Vacuum moving
    * the horizon to exactly `version` silently swaps the manifest-diff
    * list for the full snapshot (see [[listFor]]) — previously this
    * re-emitted delivered files and/or skipped undelivered ones;
    * exactly-once is unrecoverable there, so fail loudly instead (the
    * same contract as a vacuum past the offset itself). Fully-emitted
    * offsets (fingerprinted, or the legacy sentinel) resume safely
    * regardless — the swapped list is never sliced. Fingerprint-less
    * legacy mid-list offsets fail whenever continuing would slice a
    * list whose diff-ness is no longer provable. */
  private def guardResume(from: GraftSourceOffset): Unit = {
    if (from.fullyEmitted || from.isInitial || from.index < 0) return
    val swapRisk = belowHorizon(from.version - 1)
    val sizeNow = listFor(from.version, from.isInitial).size.toLong
    val identityBroken = from.listSize.exists(_ != sizeNow)
    if ((swapRisk && from.listSize.isEmpty && from.index + 1 < sizeNow) ||
        (swapRisk && identityBroken) || (!swapRisk && identityBroken))
      throw new MetadataException(
        s"Streaming read of $path: checkpointed offset stopped inside " +
          s"version ${from.version}'s file list (index ${from.index}" +
          from.listSize.fold("")(sz => s" of $sz") + s"), but that " +
          s"list is no longer the one the offset indexed (current size " +
          s"$sizeNow" +
          (if (swapRisk) ", and vacuum has passed the predecessor " +
            "version, so the manifest diff is gone" else "") +
          "); resuming would re-emit or skip files — exactly-once is " +
          "unrecoverable, restart the stream from a fresh checkpoint")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    // MicroBatchExecution requires isStreaming=true on a v1 batch
    GraftStreamingShim.asStreaming(batchFrame(start, end))

  /** The interval's rows as an ordinary batch frame — [[getBatch]] minus
    * the streaming re-root (separated so tests can act on it: an action
    * on the streaming-flagged frame trips the batch-analysis check). */
  private[streaming] def batchFrame(start: Option[Offset], end: Offset): DataFrame = {
    val endO = GraftSourceOffset.of(end)
    // versioned spans of the interval (start, end]: exclusiveFrom is the
    // start offset's index WITHIN its version (exclusive bound, None for
    // "from the beginning"), inclusiveTo the end offset's
    def spansFrom(sO: GraftSourceOffset): Seq[(Long, Boolean, Option[Long], Long)] =
      (sO.version to endO.version).map { v =>
        val isInit = sO.isInitial && v == sO.version
        // a fully-emitted start (fingerprinted, or the legacy sentinel)
        // must never slice its version's CURRENT list — the list may
        // have been swapped for the full snapshot since (see listFor)
        val from =
          if (v == sO.version)
            Some(if (sO.fullyEmitted) Long.MaxValue else sO.index)
          else None
        val to = if (v == endO.version) endO.index else Long.MaxValue
        (v, isInit, from, to)
      }
    val spans: Seq[(Long, Boolean, Option[Long], Long)] = start match {
      case None if hasStartingSpec =>
        // first batch under a starting spec (or its replay): versioned
        // diffs from the anchor — resolveAnchor recomputes it
        // deterministically after a restart (see its scaladoc)
        spansFrom(GraftSourceOffset(resolveAnchor(endO.version),
          Long.MaxValue, isInitial = false))
      case None =>
        // first batch (or its replay): a slice of the initial snapshot
        Seq((endO.version, true, None, endO.index))
      case Some(s) =>
        val sO = GraftSourceOffset.of(s)
        guardHorizon(sO.version)
        guardResume(sO)
        spansFrom(sO)
    }
    val frames = spans.flatMap { case (v, isInit, exclusiveFrom, inclusiveTo) =>
      // "version fully emitted" (anchor or legacy offset): nothing to
      // slice — skip without reading manifests the anchor may not have
      if (exclusiveFrom.contains(Long.MaxValue)) None
      else {
      val list = listFor(v, isInit)
      // saturating bounds: a legacy "version fully emitted" offset
      // carries index = Long.MaxValue — clamp within the list before the
      // +1, or the exclusive bound would overflow and re-emit the version
      val lo = exclusiveFrom.map(i => math.min(i, list.size - 1L) + 1).getOrElse(0L)
      val hi = math.min(inclusiveTo, list.size - 1L)
      if (lo > hi) None
      else {
        val files = list.slice(lo.toInt, hi.toInt + 1)
        // read under the version's OWN schema, project to the declared
        // one: a column a later version dropped null-fills, a widened
        // type casts back — the plan shape never changes mid-stream
        Some(project(table.readManifestFiles(table.readManifest(v), files)))
      }
      }
    }
    val batch = frames.reduceOption(_ unionAll _).getOrElse(
      sqlContext.sparkSession.createDataFrame(
        sqlContext.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        declaredSchema))
    // remember the served end (recovery re-seeds position this way)
    if (position.forall(p => p.version < endO.version ||
        (p.version == endO.version && p.index < endO.index)))
      position = Some(endO)
    batch
  }

  /** Pin the declared column set: null-fill dropped columns, cast
    * drifted (widened) types back. */
  private def project(df: DataFrame): DataFrame = {
    val available = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(declaredSchema.fields.toSeq.map { f =>
      available.get(f.name.toLowerCase) match {
        case Some(c) => col(s"`$c`").cast(f.dataType).as(f.name)
        case None    => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  override def commit(end: Offset): Unit = () // versions need no cleanup

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource[$path]"
}

object TableStreamSource {

  /** Parse a byte budget: a plain number, or `k`/`m`/`g` suffixed
    * (binary multiples, case-insensitive — `1g` = 1 GiB). */
  private[streaming] def parseBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    val (num, mult) = t.last match {
      case 'k' => (t.dropRight(1), 1L << 10)
      case 'm' => (t.dropRight(1), 1L << 20)
      case 'g' => (t.dropRight(1), 1L << 30)
      case _   => (t, 1L)
    }
    val v = (BigDecimal(num) * mult).toLong
    require(v > 0, s"maxBytesPerTrigger must be positive, got $s")
    v
  }
}
