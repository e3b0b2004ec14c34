package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.metadata.{Entity, Metadata, ProcessType}
import graft.pipeline.{Processing, ProcessingSummary}

/** Continuous bronze→silver ingestion via Structured Streaming.
  *
  * The reference is batch-only (SURVEY §2.6): an orchestrator invokes one
  * `Processing` run per slice. This module is the Spark-native upgrade —
  * `readStream` watches the entity's bronze directory and every new slice
  * file flows through the SAME transform chain and merge strategies via
  * `foreachBatch`, so batch and streaming ingestion share one code path
  * and produce identical silver tables.
  *
  * Scale notes: the file source tracks processed files in the checkpoint
  * (exactly-once per slice); `maxFilesPerTrigger` bounds per-batch work;
  * the managed table's atomic pointer swap means readers never see a
  * half-merged batch.
  */
final class StreamingIngest(
    metadata: Metadata,
    entity: Entity,
    checkpointDir: String,
    options: Map[String, String] = Map.empty)(implicit spark: SparkSession) {

  @volatile private var summaries: List[ProcessingSummary] = Nil

  /** Summaries of every processed micro-batch, newest first. */
  def batchSummaries: Seq[ProcessingSummary] = summaries

  /** Start the stream. Each micro-batch runs the standard pipeline once
    * per distinct slice file discovered in the batch. */
  def start(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // fail fast on Full: an overwrite per micro-batch would reduce the
    // silver table to the last batch's slices — data destruction, not
    // ingestion (previously only reachable as an unused helper)
    StreamingIngest.validate(entity)
    val bronze = metadata.bronzePath(entity)
    val schema = spark.read
      .option("recursiveFileLookup", "true").parquet(bronze).schema
    val reader = spark.readStream
      .schema(schema) // file source needs a schema
      .option("recursiveFileLookup", "true") // slices may be part-file dirs
      .option("maxFilesPerTrigger", options.getOrElse("maxFilesPerTrigger", "16"))
    // byte-based admission bound, passed through to the file source
    // (slices vary wildly in size; a file cap alone can still admit a
    // multi-GB batch)
    val raw = options.get("maxBytesPerTrigger")
      .fold(reader)(reader.option("maxBytesPerTrigger", _))
      .parquet(bronze)

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()
  }

  /** One micro-batch: group the batch's rows by originating slice file and
    * run the configured strategy per slice, preserving slice provenance
    * and watermark semantics exactly as in batch mode. Slices are
    * processed in name order so watermarks advance deterministically
    * WITHIN a batch; the watermark store is latest-write-wins (reference
    * contract), so a backfill slice landing in a LATER batch regresses
    * the bookmark — deliver out-of-order corrections with delete
    * inference disabled, or re-run the affected window. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val bronze = new org.apache.hadoop.fs.Path(metadata.bronzePath(entity))
      .toUri.getPath
    val files = batch.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    // a "slice" is the first path segment under bronze — a single parquet
    // file, or a directory of part files written as one slice
    val slices = files.map { f =>
      val uriPath = new org.apache.hadoop.fs.Path(f).toUri.getPath
      uriPath.stripPrefix(bronze).stripPrefix("/").split('/').head
    }.distinct.sorted
    slices.foreach { slice =>
      val p = new Processing(metadata, entity, slice, options)
      val summary = p.process()
      summaries = summary :: summaries
    }
  }
}

object StreamingIngest {

  /** Convenience: ingest everything currently in bronze and stop
    * (Trigger.AvailableNow), returning the per-slice summaries. */
  def ingestAvailable(
      metadata: Metadata,
      entity: Entity,
      checkpointDir: String,
      options: Map[String, String] = Map.empty)(
      implicit spark: SparkSession): Seq[ProcessingSummary] = {
    val ingest = new StreamingIngest(metadata, entity, checkpointDir, options)
    val q = ingest.start(Trigger.AvailableNow())
    q.awaitTermination()
    ingest.batchSummaries
  }

  /** Streaming is meaningful for incremental strategies; Full overwrite
    * per micro-batch is almost always a configuration error. */
  def validate(entity: Entity): Unit =
    require(entity.processType != ProcessType.Full,
      s"Streaming ingest for entity ${entity.name} requires merge/historic")
}
