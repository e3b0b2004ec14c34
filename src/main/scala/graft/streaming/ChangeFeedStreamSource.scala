package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, GraftStreamingShim, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.metadata.MetadataException
import graft.tables.ManagedTable

/** Streaming CHANGE-DATA-FEED over a [[ManagedTable]] — Delta's
  * `readChangeFeed` semantics with NO stored change files: every
  * micro-batch is the row-level CDC of one or more commits, classified
  * by diffing each version's file-granular manifest delta
  * ([[ManagedTable.rowChanges]]). Where the plain [[TableStreamSource]]
  * re-emits whole rewritten files (`ignoreChanges` semantics, consumers
  * dedupe), this source emits exactly what changed:
  *
  *  - `insert` / `delete` / `update_postimage` rows, one per changed
  *    key per commit, under the feed schema = table columns +
  *    `_change_type` (string) + `_commit_version` (long); with
  *    `changeFeedPreimages=true` each updated key also carries its old
  *    row as `update_preimage` (Delta CDF's pair) for
  *    subtract-then-add aggregate maintenance;
  *  - cost per commit is O(files that commit touched) — the
  *    file-granular MERGE keeps that minimal, so a 10-row upsert's feed
  *    reads a handful of files, never the table. Maintenance commits
  *    (compact / zorder) rewrite identical rows and therefore emit
  *    nothing;
  *  - offsets are version-granular and self-describing: the end offset
  *    records both the batch's through-version (`version`) and its
  *    exclusive from-version (`index`), so a replayed first batch needs
  *    no source-side state to reconstruct its interval;
  *  - `startingVersion` (default `latest`): `latest` streams only
  *    commits after stream start; a number N replays history from
  *    commit N onward — version 0 arrives as the full snapshot
  *    classified `insert` (there is no version −1 to diff against).
  *    Replay below the vacuum horizon fails fast with the horizon
  *    named;
  *  - `maxVersionsPerTrigger` bounds how many commits one micro-batch
  *    may cover (admission control for a stream catching up on a long
  *    backlog; each version costs one bounded duplicate-key probe at
  *    planning time, so a cap keeps triggers predictable).
  *
  * `changeFeedKeys` (the table's merge PK) is required — row-level
  * classification is a key-diff. Schema is pinned at stream start like
  * the plain source: columns a later version dropped null-fill, widened
  * types cast back.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft")
  *     .option("path", tableRoot)
  *     .option("changeFeed", "true")
  *     .option("changeFeedKeys", "id")
  *     .option("startingVersion", "0")        // optional, default latest
  *     .option("maxVersionsPerTrigger", "10") // optional
  *     .load()
  * }}}
  */
class ChangeFeedStreamSource(
    sqlContext: SQLContext,
    path: String,
    tableSchema: StructType,
    parameters: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}
  import ChangeFeedStreamSource._

  private val table = ManagedTable(sqlContext.sparkSession, path)

  /** Table-column portion of the feed (a user-supplied schema may be the
    * full feed schema — strip the meta columns back out). */
  private val dataSchema = StructType(
    tableSchema.fields.filterNot(f => MetaCols.contains(f.name)))

  private val keyCols: Seq[String] = parameters.get("changeFeedKeys")
    .orElse(table.properties.get("graft.cdc.keys")) // declared-once identity
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    .filter(_.nonEmpty)
    .getOrElse(throw new IllegalArgumentException(
      "graft change feed source requires option 'changeFeedKeys' " +
        "(the table's merge key — row-level CDC is a key-diff) or the " +
        "'graft.cdc.keys' table property"))

  /** First version whose changes the stream includes; None = latest
    * (only commits after stream start). */
  private val startingVersion: Option[Long] =
    parameters.get("startingVersion").filterNot(_.equalsIgnoreCase("latest"))
      .map { s =>
        val v = s.trim.toLong
        require(v >= 0, s"startingVersion must be >= 0 or 'latest', got $s")
        v
      }

  /** Timestamp form of [[startingVersion]] (Delta CDF's
    * `startingTimestamp`): replay from the FIRST retained commit at or
    * after the instant; an instant past the head streams only future
    * commits. Accepts epoch millis, `yyyy-MM-dd`, `yyyy-MM-dd HH:mm:ss`,
    * or ISO-8601 — date/time forms read as UTC. */
  private val startingTimestamp: Option[Long] =
    parameters.get("startingTimestamp").map(ChangeFeedStreamSource.parseTs)
  require(startingVersion.isEmpty || startingTimestamp.isEmpty,
    "graft change feed source: startingVersion and startingTimestamp " +
      "are mutually exclusive")

  private val maxVersions: Option[Long] =
    parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.trim.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }

  /** Delta CDF emits a pre/postimage PAIR per updated key; default off
    * here because upsert-style consumers ([[ManagedTable.syncChangesTo]])
    * only want the postimage. `changeFeedPreimages=true` opts in. */
  private val includePreimages: Boolean =
    parameters.get("changeFeedPreimages").exists(_.equalsIgnoreCase("true"))

  override val schema: StructType = feedSchema(dataSchema)

  /** End offset of the last batch offered or served (its `version` is
    * the emitted-through boundary). Restarts re-seed it from the batch
    * Spark replays. */
  private var position: Option[GraftSourceOffset] = None

  /** Exclusive from-boundary of the stream's FIRST batch, frozen at the
    * first poll — `latest` means the head AT STREAM START, not the head
    * at whichever later poll first sees new commits. */
  private var anchor: Option[Long] = None

  private def resolveStart(head: Long): Long =
    anchor.getOrElse {
      val f = startingVersion.map(_ - 1L)
        .orElse(startingTimestamp.map { ts =>
          // first retained commit at or after the instant; none → only
          // commits after the current head (the `latest` behavior)
          table.history().filter(_.timestampMs >= ts)
            .map(_.version).minOption.getOrElse(head + 1L) - 1L
        })
        .getOrElse(head)
      anchor = Some(f)
      f
    }

  /** Head version frozen by [[prepareForTriggerAvailableNow]]:
    * `Trigger.AvailableNow` drains the feed up to here in bounded
    * batches (the nightly-CDC drain-and-stop pattern), leaving commits
    * that race in after the trigger started for the next run. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentVersion

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Spark's admission-control entry (preferred over [[getOffset]]):
    * the engine passes the previous end offset from its checkpointed
    * state every trigger, so restarts need no source-side recovery. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val headRaw = table.currentVersion.getOrElse(return null)
    val head = availableNowCap.fold(headRaw)(math.min(_, headRaw))
    val from = Option(start).map(GraftSourceOffset.of(_).version)
      .getOrElse(resolveStart(head))
    guardHorizon(from)
    if (head <= from) start // nothing new: equal offsets mean no batch
    else {
      val to = maxVersions.fold(head)(mv => math.min(head, from + mv))
      val next = GraftSourceOffset(to, from, isInitial = false)
      if (position.forall(_.version < to)) position = Some(next)
      next
    }
  }

  override def reportLatestOffset(): OffsetV2 =
    table.currentVersion
      .map(v => GraftSourceOffset(v, Long.MaxValue, isInitial = false))
      .orNull

  override def getOffset: Option[Offset] = {
    val head = table.currentVersion.getOrElse(return position)
    val capped = availableNowCap.fold(head)(math.min(_, head))
    val from = position.map(_.version).getOrElse(resolveStart(capped))
    guardHorizon(from)
    if (capped <= from) position // nothing new
    else {
      val to = maxVersions.fold(capped)(mv => math.min(capped, from + mv))
      val next = GraftSourceOffset(to, from, isInitial = false)
      position = Some(next)
      Some(next)
    }
  }

  /** Diffing (v−1, v] needs v−1's manifest and its removed files' data —
    * both gone below the vacuum horizon. `from` = −1 (startingVersion 0)
    * instead needs version 0 itself readable. */
  private def guardHorizon(from: Long): Unit =
    table.earliestReadableVersion.foreach { e =>
      if (math.max(from, 0L) < e) throw new MetadataException(
        s"Change feed of $path from version ${math.max(from, 0L)}: vacuumed " +
          s"(earliest readable version is $e)")
    }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endO = GraftSourceOffset.of(end)
    // a replayed first batch carries its own from-boundary in the end
    // offset's index field — no source state needed
    val from = start.map(GraftSourceOffset.of(_).version).getOrElse(endO.index)
    val batch = feedFrame(from, endO.version)
    if (position.forall(_.version < endO.version)) position = Some(endO)
    GraftStreamingShim.asStreaming(batch)
  }

  /** The classified changes of versions (`fromExclusive`, `to`] as an
    * ordinary batch frame — [[getBatch]] minus the streaming re-root
    * (callable directly for backfill-style batch CDC reads). */
  private[graft] def feedFrame(fromExclusive: Long, to: Long): DataFrame = {
    guardHorizon(fromExclusive)
    val frames = (fromExclusive + 1 to to).map { v =>
      val classified =
        if (v == 0L)
          // no version −1 to diff against: the first commit IS its changes
          project(table.readVersion(0L), changeType = Some(lit("insert")))
        else
          project(table.rowChanges(v - 1, v, keyCols, includePreimages),
            changeType = None)
      classified.withColumn("_commit_version", lit(v).cast(LongType))
    }
    frames.reduceOption(_ unionAll _).getOrElse(
      sqlContext.sparkSession.createDataFrame(
        sqlContext.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  /** Pin the table-column set declared at stream start (null-fill
    * dropped columns, cast widened types back) and normalize the
    * `_change_type` column position. */
  private def project(df: DataFrame, changeType: Option[Column]): DataFrame = {
    val available = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols = dataSchema.fields.toSeq.map { f =>
      available.get(f.name.toLowerCase) match {
        case Some(c) => col(s"`$c`").cast(f.dataType).as(f.name)
        case None    => lit(null).cast(f.dataType).as(f.name)
      }
    } :+ changeType.getOrElse(col("_change_type")).cast(StringType)
      .as("_change_type")
    df.select(cols: _*)
  }

  override def commit(end: Offset): Unit = () // versions need no cleanup

  override def stop(): Unit = ()

  override def toString: String = s"GraftChangeFeedSource[$path]"
}

object ChangeFeedStreamSource {

  private[streaming] val MetaCols = Set("_change_type", "_commit_version")

  private[streaming] def enabled(parameters: Map[String, String]): Boolean =
    parameters.get("changeFeed").exists(_.equalsIgnoreCase("true"))

  /** Feed schema = table columns + the two CDC meta columns. */
  private[streaming] def feedSchema(tableSchema: StructType): StructType =
    StructType(tableSchema.fields.filterNot(f => MetaCols.contains(f.name)) :+
      StructField("_change_type", StringType) :+
      StructField("_commit_version", LongType))

  /** `startingTimestamp` value → epoch millis. Bare digits are epoch
    * millis already; `yyyy-MM-dd` and `yyyy-MM-dd HH:mm:ss` read as
    * UTC; anything else must be ISO-8601 (`2024-01-10T10:00:00Z`). */
  private[graft] def parseTs(s: String): Long = {
    val v = s.trim
    if (v.nonEmpty && v.forall(_.isDigit)) v.toLong
    else try {
      if (v.contains('T')) java.time.Instant.parse(v).toEpochMilli
      else if (v.contains(' '))
        java.time.LocalDateTime.parse(v.replace(' ', 'T'))
          .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      else java.time.LocalDate.parse(v)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    } catch {
      case e: java.time.format.DateTimeParseException =>
        throw new IllegalArgumentException(
          s"startingTimestamp '$s' is not epoch millis, yyyy-MM-dd, " +
            "yyyy-MM-dd HH:mm:ss, or ISO-8601", e)
    }
  }
}
