package graft

import org.apache.spark.sql.SparkSession

/** Session-age instrumentation (dev tool, judge r15 item #1).
  *
  * Official bench runs land 1.2-1.4x above same-code floors measured
  * minutes apart, and FLOORS.md attributes it to "session age: uniform
  * per-job overhead" after ~180 query executions. This main makes that
  * claim measurable: it runs the full query suite PASSES times in ONE
  * JVM (same session config as [[Bench]]), and between queries runs two
  * fixed canaries —
  *
  *  - `canary_rdd`: a 32-partition `parallelize(...).count()` — pure
  *    scheduler round-trip, no SQL, no codegen. If THIS grows with
  *    query index, the drag is in the core scheduler/listener path.
  *  - `canary_sql`: `spark.range(1).count()` — adds the SQL execution
  *    setup path (QueryExecution, SQLExecution id, planner). If only
  *    this grows, the drag is SQL-session state.
  *
  * plus a JVM/session state snapshot (heap after the harness GC,
  * metaspace, code-cache pools, loaded classes, cumulative GC + JIT
  * time, thread count, listener count, block-manager entries, and the
  * file count under this app's blockmgr spill dirs). One stderr line
  * per query:
  *
  *   DIAG idx=<n> pass=<p> q=<name> qsec=<s> crdd=<s> csql=<s>
  *        heap=<MB> meta=<MB> cc=<MB> classes=<n> gcms=<ms> jitms=<ms>
  *        threads=<n> listeners=<n> blocks=<n> spillfiles=<n>
  *
  * Correlate: if crdd/csql are flat while qsec pass-2 > pass-1, the
  * drag is per-QUERY state (e.g. file-status caches); if canaries grow
  * too, it is per-JOB (listener bus, accumulators, code cache).
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_DIAG_PASSES
  * (default 2), SPARK_GRAFT_BENCH_ONLY (subset).
  */
object SessionDiag {
  import java.lang.management.{ManagementFactory => mgmt}

  private def poolMb(nameContains: String): Double = {
    import scala.jdk.CollectionConverters._
    mgmt.getMemoryPoolMXBeans.asScala
      .filter(_.getName.contains(nameContains))
      .map(_.getUsage.getUsed / 1048576.0).sum
  }

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    mgmt.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  }

  /** Reflection probes into private[spark] state; -1 when unreadable. */
  private def listenerCount(spark: SparkSession): Int =
    try {
      val bus = spark.sparkContext.getClass.getMethod("listenerBus")
        .invoke(spark.sparkContext)
      bus.getClass.getMethod("listeners").invoke(bus)
        .asInstanceOf[java.util.List[_]].size
    } catch { case _: Throwable => -1 }

  private def blockCount(spark: SparkSession): Int =
    try {
      val env = org.apache.spark.SparkEnv.get
      val bm = env.getClass.getMethod("blockManager").invoke(env)
      val master = bm.getClass.getMethod("master").invoke(bm)
      // BlockManagerMaster.getStorageStatus: Array[StorageStatus]
      val st = master.getClass.getMethod("getStorageStatus").invoke(master)
        .asInstanceOf[Array[_]]
      st.map { s =>
        s.getClass.getMethod("numBlocks").invoke(s).asInstanceOf[Int]
      }.sum
    } catch { case _: Throwable => -1 }

  private def spillFileCount(): Int =
    try {
      val tmp = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      val dirs = Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
      var n = 0
      dirs.foreach { d =>
        java.nio.file.Files.walk(d.toPath).forEach { p =>
          if (java.nio.file.Files.isRegularFile(p)) n += 1
        }
      }
      n
    } catch { case _: Throwable => -1 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_DIAG_PASSES", "2").toInt
    // IDENTICAL session config to Bench.scala — the point is to reproduce
    // the official harness's aging behavior, not a tuned variant's
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      .config("spark.ui.retainedDeadExecutors", "5")
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.appStateStore.asyncTracking.enable", "true")
      .config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    try graft.queries.EngineOps.warmStaging(spark, sfDir)
    catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    // warm both canary paths so pass-1 idx-0 isn't JIT noise
    (1 to 3).foreach { _ =>
      spark.sparkContext.parallelize(1 to 32, 32).count()
      spark.range(1).count()
    }

    var idx = 0
    val passTotals = Array.fill(passes)(0.0)
    (1 to passes).foreach { pass =>
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"DIAG_ERR q=$name pass=$pass " +
                     s"${e.getClass.getSimpleName}: " +
                     String.valueOf(e.getMessage).replace('\n', ' ').take(300))
                   false
                 }
        val qsec = (System.nanoTime() - t0) / 1e9
        if (ok) passTotals(pass - 1) += qsec
        // same inter-query cleanup the bench harness performs
        graft.ops.SubstrateCache.release(spark)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        Thread.sleep(50)
        // canaries AFTER cleanup — they measure residual session drag,
        // not the just-run query's droppings
        val c0 = System.nanoTime()
        spark.sparkContext.parallelize(1 to 32, 32).count()
        val crdd = (System.nanoTime() - c0) / 1e9
        val c1 = System.nanoTime()
        spark.range(1).count()
        val csql = (System.nanoTime() - c1) / 1e9
        val heap = {
          val u = mgmt.getMemoryMXBean.getHeapMemoryUsage
          u.getUsed / 1048576.0
        }
        System.err.println(
          f"DIAG idx=$idx%d pass=$pass%d q=$name%s ok=$ok%b qsec=$qsec%.3f " +
          f"crdd=$crdd%.4f csql=$csql%.4f heap=$heap%.0f " +
          f"meta=${poolMb("Metaspace")}%.0f cc=${poolMb("CodeHeap")}%.0f " +
          f"classes=${mgmt.getClassLoadingMXBean.getLoadedClassCount}%d " +
          f"gcms=$gcMs%d jitms=${mgmt.getCompilationMXBean.getTotalCompilationTime}%d " +
          f"threads=${mgmt.getThreadMXBean.getThreadCount}%d " +
          f"listeners=${listenerCount(spark)}%d blocks=${blockCount(spark)}%d " +
          f"spillfiles=${spillFileCount()}%d")
        idx += 1
      }
      System.err.println(f"DIAG_PASS pass=$pass%d total=${passTotals(pass - 1)}%.2f")
      // thread-name histogram: collapse trailing digits so pooled threads
      // with numeric suffixes group ("shuffle-client-5-1" -> family)
      val byFamily = Thread.getAllStackTraces.keySet
        .toArray(Array.empty[Thread])
        .groupBy(t => t.getName.replaceAll("[0-9]+", "N"))
        .view.mapValues(_.length).toSeq.sortBy(-_._2)
      byFamily.take(25).foreach { case (fam, n) =>
        System.err.println(s"DIAG_THREADS pass=$pass n=$n family=$fam")
      }
    }
    println(passTotals.zipWithIndex
      .map { case (t, i) => f""""pass${i + 1}":$t%.2f""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
