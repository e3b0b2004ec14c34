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
    * submits entities concurrently (each still a full pipeline). */
  def processEntities(
      metadata: Metadata,
      entities: Seq[Entity],
      sliceFile: String,
      options: Map[String, String] = Map.empty,
      parallelism: Int = 1)(implicit spark: SparkSession): Seq[EntityResult] = {
    def runOne(e: Entity): EntityResult =
      EntityResult(e.id, e.name,
        Try(new Processing(metadata, e, sliceFile, options).process()).toEither)

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
