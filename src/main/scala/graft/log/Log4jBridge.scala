package graft.log

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.{Appender, Filter, LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.{AbstractAppender, AsyncAppender}
import org.apache.logging.log4j.core.config.{AppenderRef, LoggerConfig, Property}
import org.apache.logging.log4j.core.filter.{CompositeFilter, MarkerFilter, ThresholdFilter}

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.UUID

/** Log4j2 → [[LogSink]] bridge (reference:
  * src/main/scala/datalake/log/Log4jConfigurator.scala:17-120): lets a
  * user's ordinary Log4j2 loggers — and Spark's own, if routed — feed the
  * engine's buffered Parquet/VARIANT log sinks.
  *
  * Mechanism parity with the reference:
  *  - a base appender converting each `LogEvent` into a [[LogRecord]]
  *    (run_id / entity_id / payload read from the event's captured
  *    `ThreadContext` data, so they survive the async handoff);
  *  - wrapped in an `AsyncAppender` (blocking, 1024-slot ring) so the
  *    emitting thread never waits on a Parquet flush;
  *  - attached to a named logger whose filter ACCEPTs AUDIT-marked events
  *    unconditionally and applies the threshold to everything else.
  *
  * ThreadContext keys: `run_id` (falls back to the bridge's per-init id),
  * `entity_id` (int, -1 if absent/garbled), `payload` (JSON string, `{}`
  * if absent). Log4j captures context data into the immutable event AT THE
  * LOG SITE, which is what makes per-thread run ids correct under async
  * dispatch (spec: Log4jBridgeSpec "concurrent threads keep their run_id").
  */
object Log4jBridge {

  /** Base appender: one LogEvent → one sink row. Package-visible so the
    * spec can drive it synchronously. */
  private[log] final class LogSinkAppender(
      name: String, sink: LogSink, defaultRunId: String)
    extends AbstractAppender(name, null, null, true, Property.EMPTY_ARRAY) {

    override def append(event: LogEvent): Unit = {
      val ctx = event.getContextData
      val runId = Option(ctx.getValue[AnyRef]("run_id"))
        .map(_.toString).getOrElse(defaultRunId)
      val entityId = Option(ctx.getValue[AnyRef]("entity_id"))
        .flatMap(v => scala.util.Try(v.toString.toInt).toOption).getOrElse(-1)
      val payload = Option(ctx.getValue[AnyRef]("payload"))
        .map(_.toString).getOrElse("{}")
      sink.append(LogRecord(
        LocalDateTime.ofInstant(
          Instant.ofEpochMilli(event.getTimeMillis), ZoneOffset.UTC),
        event.getLevel.name, event.getLoggerName,
        event.getMessage.getFormattedMessage, runId, entityId, payload))
    }
  }

  private final case class Bridge(
      loggerName: String, async: AsyncAppender, base: LogSinkAppender,
      sink: LogSink, runId: String)

  // one bridge per logger name; init is idempotent per name
  private val bridges =
    new java.util.concurrent.ConcurrentHashMap[String, Bridge]()

  private val StopTimeoutMs = 2000L

  /** Attach an async bridge routing `loggerName` (and its children, by
    * Log4j name hierarchy) into `sink`. Returns the bridge's run id (used
    * for events whose ThreadContext carries none). Idempotent per logger
    * name. `level` gates non-AUDIT events; AUDIT-marked events always
    * pass (reference filter contract, Log4jConfigurator.scala:76-86). */
  def init(sink: LogSink, loggerName: String = "graft",
      level: Level = Level.INFO, runId: Option[String] = None): String =
    synchronized {
      val existing = bridges.get(loggerName)
      if (existing != null) return existing.runId
      val id = runId.getOrElse(UUID.randomUUID().toString)

      val ctx = LoggerContext.getContext(false)
      val config = ctx.getConfiguration

      val base = new LogSinkAppender(s"GraftSink-$loggerName", sink, id)
      base.start()
      config.addAppender(base)

      val async = AsyncAppender.newBuilder()
        .setName(s"GraftAsync-$loggerName")
        .setAppenderRefs(
          Array(AppenderRef.createAppenderRef(base.getName, null, null)))
        .setConfiguration(config)
        .setBlocking(true) // block when full: audit events must not drop
        .setBufferSize(1024)
        .build()
      async.start()
      config.addAppender(async)

      val loggerConfig = Option(config.getLoggerConfig(loggerName))
        .filter(_.getName == loggerName)
        .getOrElse {
          val lc = new LoggerConfig(loggerName, level, true)
          config.addLogger(loggerName, lc)
          lc
        }
      // the logger gate must sit at or below INFO so AUDIT events (INFO
      // level + marker) reach the appender filter at all
      loggerConfig.setLevel(
        if (level.intLevel() < Level.INFO.intLevel()) Level.INFO else level)
      val auditFilter = MarkerFilter.createFilter(
        "AUDIT", Filter.Result.ACCEPT, Filter.Result.NEUTRAL)
      val thresholdFilter = ThresholdFilter.createFilter(
        level, Filter.Result.ACCEPT, Filter.Result.DENY)
      loggerConfig.addAppender(async, null,
        CompositeFilter.createFilters(Array(auditFilter, thresholdFilter)))
      ctx.updateLoggers()

      bridges.put(loggerName, Bridge(loggerName, async, base, sink, id))
      id
    }

  /** Drain the async queue and flush the sink's driver buffer — every
    * event logged-before-flush is durably in the sink's storage after
    * this returns. The async appender is stop/started around the drain
    * (same technique as the reference's flush,
    * Log4jConfigurator.scala:158-173). */
  def flush(loggerName: String = "graft"): Unit = synchronized {
    val b = bridges.get(loggerName)
    if (b != null) {
      b.async.stop(StopTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      b.sink.flush()
      b.async.start()
    }
  }

  /** Detach and stop the bridge's appenders, flushing pending events. */
  def shutdown(loggerName: String = "graft"): Unit = synchronized {
    val b = bridges.remove(loggerName)
    if (b != null) {
      val ctx = LoggerContext.getContext(false)
      val config = ctx.getConfiguration
      Option(config.getLoggerConfig(loggerName))
        .filter(_.getName == loggerName)
        .foreach(_.removeAppender(b.async.getName))
      ctx.updateLoggers()
      b.async.stop(StopTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      b.base.stop()
      b.sink.flush()
    }
  }

  def runId(loggerName: String = "graft"): Option[String] =
    Option(bridges.get(loggerName)).map(_.runId)
}
