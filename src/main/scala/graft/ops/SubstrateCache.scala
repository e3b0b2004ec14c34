package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry of DataFrames the ops layer persists internally — the
  * library-owned-cache lifecycle for long-lived sessions.
  *
  * Self-join operators ([[TextOps.minHashNearDupPairs]],
  * [[TextOps.blockedJaccardPairs]], [[SimilarityOps.embeddingNearDupPairs]])
  * persist their per-doc substrate because both join sides reference it —
  * without the persist the (expensive) substrate computation runs 2-4×.
  * The returned frame is lazy, so the operator cannot unpersist before the
  * caller's terminal action; ownership of the cache therefore transfers to
  * the session. This registry makes that ownership explicit and releasable:
  * every internal persist is recorded here, and [[release]] drops exactly
  * the library's caches — unlike `spark.catalog.clearCache()`, it never
  * touches frames the USER persisted.
  *
  * Contract for long-lived sessions (the `Runner.parallelism` model, the
  * bench harness): call `SubstrateCache.release(spark)` after consuming an
  * operator's output, at batch boundaries, or on any memory-pressure
  * signal. Every registered substrate keeps its full lineage (persists here
  * are pure accelerators, never `localCheckpoint`s), so releasing early is
  * always safe — a later action on a still-held result recomputes at full
  * codegen speed instead of reading the cache.
  */
object SubstrateCache {

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Queue[DataFrame]]()

  /** Persist `df` (MEMORY_AND_DISK) and record it for [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    registry.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every substrate the ops layer registered for `spark`.
    * Non-blocking; results still held by the caller remain valid (their
    * lineage recomputes). Idempotent. */
  def release(spark: SparkSession): Unit = {
    val q = registry.remove(spark)
    if (q != null) q.forEach(df => df.unpersist(false))
  }

  /** Substrates currently registered for `spark` (0 after [[release]]). */
  def registered(spark: SparkSession): Int = {
    val q = registry.get(spark)
    if (q == null) 0 else q.size
  }
}
