package graft.pipeline

import org.apache.spark.sql.SparkSession

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

import graft.metadata.{Entity, Metadata}

/** Driver-side orchestration over many entities — the in-process
  * equivalent of the reference's external-orchestrator loop (the ADF items
  * from [[graft.outputs.DataFactory]] map 1:1 onto these calls).
  *
  * Entities are independent pipelines, so they can run concurrently on
  * one SparkSession: Spark's scheduler interleaves their jobs; useful when
  * single-entity stages underutilize the cluster. Failures are isolated
  * per entity and reported, not cascaded. */
object Runner {

  final case class EntityResult(
      entityId: Int,
      name: String,
      result: Either[Throwable, ProcessingSummary])

  /** Process one slice name through every given entity. `parallelism` > 1
    * submits entities concurrently (each still a full pipeline).
    *
    * Each entity runs inside its own [[graft.ops.SubstrateCache.scoped]]
    * block: any substrate an operator persists during the entity's
    * pipeline lands on that entity's private handle and is released when
    * the entity finishes — one entity's batch-boundary release can never
    * unpersist another entity's in-flight substrate (the hazard of the
    * session-wide `SubstrateCache.release` under a concurrent runner). */
  def processEntities(
      metadata: Metadata,
      entities: Seq[Entity],
      sliceFile: String,
      options: Map[String, String] = Map.empty,
      parallelism: Int = 1)(implicit spark: SparkSession): Seq[EntityResult] = {
    def runOne(e: Entity): EntityResult = {
      val (result, handle) = graft.ops.SubstrateCache.scoped(
        Try(new Processing(metadata, e, sliceFile, options).process()))
      handle.release()
      EntityResult(e.id, e.name, result.toEither)
    }

    if (parallelism <= 1) entities.map(runOne)
    else {
      val pool = Executors.newFixedThreadPool(parallelism)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = entities.map(e => Future(runOne(e)))
        Await.result(Future.sequence(fs), Duration.Inf)
      } finally pool.shutdown()
    }
  }

  /** Silver-table maintenance for one entity — the background pass a
    * lakehouse runs off the ingest path: fold small merge-commit files,
    * re-cluster along the entity's `zorder_by` setting (comma-separated
    * columns; multi-dimensional data skipping via
    * [[graft.tables.ManagedTable.zorder]]), backfill any missing file
    * stats, and optionally vacuum history. Every step is its own atomic
    * commit; readers never block. No-op for entities not yet written. */
  def maintainEntity(
      metadata: Metadata,
      e: Entity,
      vacuum: Boolean = false)(implicit spark: SparkSession): Unit = {
    val table = graft.tables.ManagedTable.forLocation(spark, metadata.silverLocation(e))
    if (table.exists) {
      val zorderCols = e.settingString("zorder_by").map(_.split(',').map(_.trim)
        .filter(_.nonEmpty).toSeq).filter(_.nonEmpty)
      // size-aware file-granular compaction when the entity sets
      // `compact_small_bytes`: only sub-threshold files are rewritten,
      // everything else carries verbatim — the maintenance cost scales
      // with small-file bytes, not table size
      val smallBytes = e.settingString("compact_small_bytes")
        .flatMap(s => scala.util.Try(s.trim.toLong).toOption).filter(_ > 0)
      zorderCols match {
        // the z-order rewrite IS the compaction (one full rewrite into
        // range-partitioned files); compact() before it would collapse the
        // table to one file per partition, pinning zorder's default file
        // count at 1 — no file ever skippable — and rewrite twice
        case Some(cols)                  => table.zorder(cols)
        case None if smallBytes.nonEmpty => table.compactSmall(smallBytes.get)
        case None                        => table.compact()
      }
      table.collectStatistics()
      // `bloom_index` setting: equality-lookup columns to bloom-index
      // (registers once, then every write keeps sidecars current; the
      // call after a compaction/zorder rewrite also backfills the
      // rewritten files' sidecars via onlyMissing). Absent the setting,
      // the surrogate PK is indexed by default — it is the MERGE key,
      // and the keyed merge's touch-detect probe data-skips through
      // exactly this sidecar (a uniform hash PK is unprunable by
      // min/max); an explicitly empty setting opts out.
      val bloomCols = e.settingString("bloom_index") match {
        case Some(s) => s.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        case None =>
          val pk = e.primaryKeyColumnName
          if (table.manifest.exists(_.schema.fieldNames.contains(pk)))
            Seq(pk) else Nil
      }
      bloomCols.foreach(c => table.addBloomIndex(c))
      // declare the CDC identity once: the surrogate PK is the merge
      // key, so `table_changes('db.t', from, to)` and the change-feed
      // stream work without per-call key plumbing
      val pk = e.primaryKeyColumnName
      if (table.manifest.exists(_.schema.fieldNames.contains(pk)) &&
          !table.properties.contains("graft.cdc.keys"))
        table.setTableProperties(Map("graft.cdc.keys" -> pk))
      if (vacuum) table.vacuum()
    }
  }

  /** All enabled entities of a group (reference: DataFactory group feed). */
  def processGroup(
      metadata: Metadata,
      group: String,
      sliceFile: String,
      options: Map[String, String] = Map.empty,
      parallelism: Int = 1)(implicit spark: SparkSession): Seq[EntityResult] =
    processEntities(metadata,
      metadata.getEntitiesByGroup(group).filter(metadata.isEnabled),
      sliceFile, options, parallelism)

  private implicit class TryOps[A](t: Try[A]) {
    def toEither: Either[Throwable, A] = t match {
      case Success(a) => Right(a)
      case Failure(e) => Left(e)
    }
  }
}
