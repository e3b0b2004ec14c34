package graft.tables

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Idempotent incremental bulk file loading — Delta's `COPY INTO`: each
  * invocation loads ONLY source files not loaded by a previous
  * invocation, exactly once, surviving crashes mid-load.
  *
  * Composed from two engine pieces that already carry the hard
  * guarantees instead of a third bespoke ledger:
  *
  *  - Spark's `FileStreamSource` tracks seen files in a compacted
  *    checkpoint log (scales to millions of files — the same machinery
  *    production auto-loaders rely on), keyed here per (table, source
  *    directory) under `<table>/_graft/_copy/`;
  *  - the graft streaming SINK lands batches with writer-identity
  *    exactly-once (txn embedded in the commit record, atomic with the
  *    data — [[graft.streaming.TableStreamSink]]), so a crash between
  *    "rows appended" and "files marked seen" replays into suppressed
  *    duplicates, never double loads.
  *
  * One `Trigger.AvailableNow` run drains everything new and stops. The
  * target table is created on first load if absent. When the target
  * exists, its schema governs the scan: source files missing a column
  * read null there, extra columns fail the append (the engine's
  * missing-column contract) — cast/rename reshaping belongs in a real
  * pipeline, not a bulk loader.
  *
  * At 100 TB this is the idempotent landing primitive: re-running a
  * failed nightly load is safe, partially-arrived directories load the
  * remainder next run, and nothing ever scans the already-loaded bulk. */
object CopyInto {

  private def dirKey(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString

  /** Load new files from `sourceDir` into the table at `tableRoot`.
    * Returns the number of rows appended by THIS invocation. */
  def apply(spark: SparkSession, tableRoot: String, sourceDir: String,
      format: String = "parquet",
      options: Map[String, String] = Map.empty): Long = {
    val t = ManagedTable(spark, tableRoot)
    val schema =
      if (t.exists) t.read().schema
      else spark.read.format(format).options(options).load(sourceDir).schema
    val ckpt = s"$tableRoot/_graft/_copy/${dirKey(sourceDir)}"
    // count what actually LANDED, from the table's own manifest — not
    // streaming progress, which caps at numRecentProgressUpdates batches
    // and counts input rows even for crash-replayed batches the sink
    // suppressed
    val before: Set[String] =
      t.manifest.map(_.files.map(_.path).toSet).getOrElse(Set.empty)
    val q = spark.readStream.format(format).schema(schema).options(options)
      .load(sourceDir)
      .writeStream.format("graft")
      .option("path", tableRoot)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      t.manifest.fold(0L)(_.files.iterator
        .filterNot(f => before.contains(f.path))
        .map(f => f.liveRows.getOrElse {
          // commit-time footer stats failed for this file (rare, never
          // fails the commit) — one footer read recovers the exact count
          spark.read.parquet(new org.apache.hadoop.fs.Path(
            new org.apache.hadoop.fs.Path(tableRoot), f.path).toString).count()
        }).sum)
    } finally if (q.isActive) q.stop()
  }
}
