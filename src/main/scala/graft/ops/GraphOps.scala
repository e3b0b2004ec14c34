package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph primitives for dedup-group resolution.
  *
  * Near-dup detection emits PAIRS; acting on them (keep one doc per
  * group) needs connected COMPONENTS. This is the piece that turns
  * `TextOps.minHashNearDupPairs` / `SimilarityOps.embeddingNearDupPairs`
  * output into canonical group ids.
  *
  * Scale behavior: iterative min-label propagation — one equi-join + one
  * hash-aggregate shuffle per round, converging in O(graph diameter)
  * rounds. Near-dup graphs are dense clusters with tiny diameter (2-4), so
  * the loop runs a handful of rounds regardless of corpus size, and every
  * round is embarrassingly parallel on the node hash. Labels only ever
  * decrease, so convergence is detected by comparing the per-round label
  * SUM (exact decimal, no joins). Lineage is truncated each round with
  * `localCheckpoint` to keep plan analysis O(1) per round.
  */
object GraphOps {

  /** Drop a superseded `localCheckpoint` round's cached blocks. A plain
    * `df.unpersist()` is a no-op for checkpointed frames — the blocks
    * belong to the internal RDD inside the plan's `LogicalRDD`, not to a
    * CacheManager entry — so the iterative ops would otherwise leak
    * O(rounds × rows) of block-manager memory per call. Only ever call
    * this on a round that nothing will read again: a locally
    * checkpointed RDD's lineage is truncated, so its blocks cannot be
    * recomputed after unpersisting. */
  private[ops] def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Connected components of an undirected edge list.
    *
    * Returns one row per node that appears in `edges`:
    * `(node, component)` with `component` = minimum node id reachable
    * (including itself) — a deterministic canonical group id.
    *
    * @param maxIters safety cap; propagation converges in O(diameter)
    *                 rounds and stops as soon as no label changes.
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // ids must be integral ALREADY: a silent cast of string/UUID ids would
    // null every edge and return an empty result instead of an error —
    // "no duplicates found" when dedup simply never ran. Map string ids
    // through a stable hash (e.g. TextOps.portableHash) first.
    Seq(srcCol, dstCol).foreach { c =>
      import org.apache.spark.sql.types._
      val dt = edges.schema(c).dataType
      require(Set[DataType](LongType, IntegerType, ShortType, ByteType)(dt),
        s"connectedComponents requires integral node ids; column '$c' is " +
          s"${dt.simpleString} — hash string ids to longs first")
    }
    val src = col(s"`$srcCol`").cast("long")
    val dst = col(s"`$dstCol`").cast("long")
    // persist the (possibly very expensive) upstream pair plan FIRST: `sym`
    // references it twice (forward + swapped), and without the persist the
    // whole near-dup pipeline would execute twice
    val in = edges.select(src.as("a"), dst.as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // persisted hash-partitioned on the probe key `b`: the per-round join
    // (sym.b == labels.node) then reads the cached layout with NO exchange
    // on the edge side — labels comes out of its aggregation hash(node)
    // with the same partition count, so rounds shuffle only the (small)
    // label union, never the edge list
    val sym = in
      .union(in.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    if (sym.isEmpty) {
      sym.unpersist(); in.unpersist()
      return Seq.empty[(Long, Long)].toDF("node", "component")
    }

    // init: each node labeled with min(itself, its neighbors) — the first
    // propagation round fused into the node-list aggregation.
    // localCheckpoint is LAZY throughout: it caches partitions as the
    // convergence-sum action computes them, so each round is ONE job
    // (propagate + materialize + sum), not a checkpoint job plus a sum job
    var labels = sym
      .groupBy(col("a").as("node"))
      .agg(min(least(col("a"), col("b"))).as("component"))
      .localCheckpoint(eager = false)

    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head()
        .getDecimal(0)

    var prevSum = labelSum(labels)
    in.unpersist() // sym is materialized by the init aggregation above
    var iter = 1
    var converged = false
    while (!converged && iter < maxIters) {
      val neighborLabels = sym
        .join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("component"))
      val next = labels.union(neighborLabels)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      // the sum action materialized every partition of `next`, truncating
      // its lineage to its own cached blocks — the superseded round's
      // blocks are unreachable from here on and must not accumulate
      // (O(rounds × nodes) leaked cache otherwise; under a long bench or
      // service session that pressure evicts OTHER queries' caches)
      dropCheckpoint(labels)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist()
    // an unconverged exit means the labels are WRONG (some nodes still carry
    // a non-minimal component id) — returning them silently would corrupt
    // canonical-doc selection downstream. maxIters is an error bound, not a
    // truncation point: component diameter > maxIters is a data shape this
    // caller must opt into by raising the cap.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters iterations " +
          "(component diameter exceeds the cap); raise maxIters")
    labels
  }

  /** Dedup groups from near-dup pairs: `(doc, group, is_canonical)` for
    * every doc in at least one pair. Keep `is_canonical` rows, drop the
    * rest — the standard corpus-dedup contract. */
  def dedupGroups(pairs: DataFrame, idA: String, idB: String): DataFrame =
    connectedComponents(pairs, idA, idB)
      .select(col("node").as("doc_id"), col("component").as("group_id"),
        (col("node") === col("component")).as("is_canonical"))

  /** Pick ONE representative per dedup group by quality instead of the
    * min-id canonical: highest `scoreCol` wins, lowest id breaks ties —
    * deterministic across runs and engines. This is the curation step
    * that makes near-dup groups actionable ("keep the best member of
    * each cluster, drop the rest"): min-id keeps an arbitrary member;
    * score-based keeps the longest / cleanest / highest-rated one.
    *
    * Returns (groupCol, rep_id, rep_score, n_members).
    *
    * Scale shape: one equi-join of the group table against the scores,
    * then a window partitioned on the group id — near-dup groups are
    * small (bounded by real duplication), so the per-group sort is local
    * and the rank-1 filter is Spark's partial window-group-limit shape.
    * Both the window and the implied shuffle hash on the group id. */
  def bestRepresentatives(groups: DataFrame, idCol: String, groupCol: String,
      scored: DataFrame, scoredIdCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = groups
      .join(scored, groups(idCol) === scored(scoredIdCol))
      .drop(scored(scoredIdCol))
    val byGroup = Window.partitionBy(col(s"`$groupCol`"))
    val w = byGroup.orderBy(col(s"`$scoreCol`").desc, col(s"`$idCol`"))
    joined.withColumn("__rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(byGroup))
      .filter(col("__rn") === 1)
      .select(col(s"`$groupCol`"), col(s"`$idCol`").as("rep_id"),
        col(s"`$scoreCol`").as("rep_score"), col("n_members"))
  }
}
