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
  * the caller. This registry makes that ownership explicit and releasable
  * at two granularities:
  *
  *  - '''Scoped (preferred for concurrent callers).''' Build the operator
  *    inside [[scoped]]; every substrate it persists is recorded on the
  *    returned [[Handle]], and `handle.release()` drops exactly those.
  *    Under the `Runner.parallelism` model — many entities sharing one
  *    driver/session — this is the only granularity that cannot interfere:
  *    one entity's batch-boundary release never unpersists another
  *    entity's in-flight substrate.
  *  - '''Session-wide.''' [[release]] drops every substrate registered for
  *    the session that is not scope-owned. Right for single-batch
  *    harnesses (the bench, the verifier) that own the whole session;
  *    WRONG inside a concurrent runner, where it would silently forfeit
  *    other threads' 2-4× recompute protection (the result stays correct —
  *    lineage recomputes — but the accelerator is gone).
  *
  * Unlike `spark.catalog.clearCache()`, neither path ever touches frames
  * the USER persisted. Every registered substrate keeps its full lineage
  * (persists here are pure accelerators, never `localCheckpoint`s), so
  * releasing early is always safe. Sessions that never release hold strong
  * references to their registered frames until session end — long-lived
  * sessions must pick one of the two release points above.
  */
object SubstrateCache {

  /** Release token for the substrates one operator (or one batch of
    * operators) persisted inside a [[scoped]] block. */
  final class Handle private[SubstrateCache] () {
    private val dfs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private[SubstrateCache] def add(df: DataFrame): Unit = dfs.add(df)

    /** Substrates this handle owns (0 after [[release]]). */
    def size: Int = dfs.size

    /** Unpersist exactly this handle's substrates. Non-blocking; results
      * still held by the caller remain valid (lineage recomputes).
      * Idempotent. */
    def release(): Unit = {
      var df = dfs.poll()
      while (df != null) { df.unpersist(false); df = dfs.poll() }
    }
  }

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.Queue[DataFrame]]()
  private val activeScope = new ThreadLocal[Handle]

  /** Persist `df` (MEMORY_AND_DISK) and record it — on the current thread's
    * open [[scoped]] handle if one is active, else session-wide for
    * [[release]]. */
  private[graft] def persist(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val h = activeScope.get()
    if (h != null) h.add(df)
    else registry.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Run `body` (typically: build one operator's plan) recording every
    * substrate it persists on a private [[Handle]]. The handle is bound to
    * the CURRENT THREAD for the duration of `body` — operators build their
    * plans synchronously, so everything they persist lands on it. Nests:
    * an inner scope shadows the outer one. Call `handle.release()` after
    * the terminal action on the operator's output. */
  def scoped[T](body: => T): (T, Handle) = {
    val h = new Handle
    val prev = activeScope.get()
    activeScope.set(h)
    try { (body, h) }
    finally { if (prev == null) activeScope.remove() else activeScope.set(prev) }
  }

  /** Unpersist every NON-scoped substrate registered for `spark`. See the
    * class doc: single-batch harnesses only — inside a concurrent runner
    * use [[scoped]] handles instead. Non-blocking, idempotent. */
  def release(spark: SparkSession): Unit = {
    val q = registry.remove(spark)
    if (q != null) q.forEach(df => df.unpersist(false))
  }

  /** Non-scoped substrates currently registered for `spark`
    * (0 after [[release]]). */
  def registered(spark: SparkSession): Int = {
    val q = registry.get(spark)
    if (q == null) 0 else q.size
  }
}
