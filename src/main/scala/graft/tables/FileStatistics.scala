package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation

import scala.jdk.CollectionConverters._

/** Extracts per-file min/max column statistics from parquet footers at
  * commit time (the writer already produced them; this only reads
  * metadata, not data).
  *
  * Scale note: [[forPaths]] reads footers on the driver below
  * [[DistributedThreshold]] files (latency: no job setup for the common
  * per-slice commit) and as a Spark job above it (throughput: a commit or
  * backfill touching thousands of files fans footer reads out across
  * executors). The manifest format is the same either way.
  */
object FileStatistics {

  /** One footer's metadata: per-column min/max, per-column exact null
    * counts (recorded only when EVERY row group set them — a partial
    * sum would lie; present even for all-null columns, which have no
    * min/max), plus the exact row count (-1 when the footer was
    * unreadable — stats are an optimization and must never fail a
    * commit). */
  final case class FileMeta(cols: Map[String, ColStats], rows: Long,
      nulls: Map[String, Long] = Map.empty)

  /** Commit sizes below this read footers on the driver; at or above it
    * the reads distribute across executors. */
  val DistributedThreshold = 64

  /** Per-file stats for `paths`, keyed by qualified path string; strategy
    * picked by file count. `maxIndexedCols` caps stats to the file
    * schema's FIRST N top-level columns (Delta's
    * dataSkippingNumIndexedCols): on a 1000-column table, per-file
    * min/max for every column is manifest bloat that slows every
    * driver-side prune — put skip-worthy columns first. */
  def forPaths(spark: org.apache.spark.sql.SparkSession, conf: Configuration,
      paths: Seq[Path], maxIndexedCols: Int = Int.MaxValue): Map[String, FileMeta] =
    if (paths.size < DistributedThreshold)
      driverParallel(conf, paths, maxIndexedCols)
    else collectDistributed(spark, conf, paths, maxIndexedCols)

  /** Driver-side footer reads on a bounded thread pool. Each read is an
    * independent metadata round trip (open + footer parse, no data), so
    * a per-commit batch of N files costs ~N/threads round trips instead
    * of N — this is commit-latency critical: every write commit and every
    * streaming micro-batch pays exactly one such batch. */
  private def driverParallel(conf: Configuration, paths: Seq[Path],
      maxIndexedCols: Int): Map[String, FileMeta] = {
    if (paths.size <= 1)
      return paths.map(p => p.toString -> fromFooter(conf, p, maxIndexedCols)).toMap
    val threads = math.min(paths.size, 16)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futures = paths.map { p =>
        scala.concurrent.Future(p.toString -> fromFooter(conf, p, maxIndexedCols))
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
  }

  /** Footer reads as a Spark job — one task per slice of files. The Hadoop
    * conf travels as key/value pairs (Configuration is not serializable). */
  def collectDistributed(spark: org.apache.spark.sql.SparkSession,
      conf: Configuration, paths: Seq[Path],
      maxIndexedCols: Int = Int.MaxValue): Map[String, FileMeta] = {
    val confEntries = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
    val strs = paths.map(_.toString)
    val slices = math.max(1, math.min(strs.size / 16,
      spark.sparkContext.defaultParallelism * 4))
    spark.sparkContext.parallelize(strs, slices)
      .mapPartitions { it =>
        val c = new Configuration(false)
        confEntries.foreach { case (k, v) => c.set(k, v) }
        it.map(s => s -> fromFooter(c, new Path(s), maxIndexedCols))
      }
      .collect().toMap
  }

  /** Min/max for every top-level primitive column the footer has stats
    * for. Types map to the three comparison domains of [[ColStats]]:
    * int32/int64 (incl. date/timestamp logical types) → long,
    * float/double → double, UTF8 binary → string. */
  def fromFooter(conf: Configuration, file: Path,
      maxIndexedCols: Int = Int.MaxValue): FileMeta = {
    var reader: ParquetFileReader = null
    try {
      // open() eagerly reads the footer — it must sit inside the catch:
      // stats are an optimization and must never fail a commit
      reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      val indexed: Set[String] = reader.getFooter.getFileMetaData.getSchema
        .getFields.asScala.iterator.map(_.getName).take(maxIndexedCols).toSet
      val blocks = reader.getFooter.getBlocks.asScala
      val rowCount = blocks.iterator.map(_.getRowCount).sum
      val acc = scala.collection.mutable.Map.empty[String, ColStats]
      // null counts: exact only if every chunk of the column sets one
      val nullAcc = scala.collection.mutable.Map.empty[String, Long]
      val nullBroken = scala.collection.mutable.Set.empty[String]
      for (block <- blocks; chunk <- block.getColumns.asScala) {
        val pathParts = chunk.getPath.toArray
        if (pathParts.length == 1 && indexed.contains(pathParts(0))) {
          val name = pathParts(0)
          val st = chunk.getStatistics
          if (st != null && !st.isEmpty && st.isNumNullsSet)
            nullAcc(name) = nullAcc.getOrElse(name, 0L) + st.getNumNulls
          else nullBroken += name
          if (st != null && !st.isEmpty && st.hasNonNullValue) {
            val primitive = chunk.getPrimitiveType
            val logical = primitive.getLogicalTypeAnnotation
            val isDecimal =
              logical.isInstanceOf[LogicalTypeAnnotation.DecimalLogicalTypeAnnotation]
            val parsed: Option[ColStats] = primitive.getPrimitiveTypeName match {
              // decimal int32/int64 footers store UNSCALED values — skipping
              // against scaled bounds would drop files; record no stats
              case _ if isDecimal => None
              case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
                Some(ColStats("long",
                  st.genericGetMin.asInstanceOf[Number].longValue.toString,
                  st.genericGetMax.asInstanceOf[Number].longValue.toString))
              case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                Some(ColStats("double",
                  st.genericGetMin.asInstanceOf[Number].doubleValue.toString,
                  st.genericGetMax.asInstanceOf[Number].doubleValue.toString))
              case PrimitiveTypeName.BINARY
                  if logical == LogicalTypeAnnotation.stringType() =>
                Some(ColStats("string",
                  st.genericGetMin.asInstanceOf[Binary].toStringUsingUTF8,
                  st.genericGetMax.asInstanceOf[Binary].toStringUsingUTF8))
              case _ => None
            }
            parsed.foreach { s =>
              acc.get(name) match {
                case None => acc(name) = s
                case Some(prev) =>
                  acc(name) = ColStats(s.typ,
                    minOf(prev, prev.min, s.min), maxOf(prev, prev.max, s.max))
              }
            }
          }
        }
      }
      FileMeta(acc.toMap, rowCount,
        (nullAcc -- nullBroken).toMap)
    } catch {
      case _: Exception => FileMeta(Map.empty, -1L) // never fatal
    } finally if (reader != null) reader.close()
  }

  private def minOf(ref: ColStats, a: String, b: String): String =
    if (cmp(ref, a, b) <= 0) a else b
  private def maxOf(ref: ColStats, a: String, b: String): String =
    if (cmp(ref, a, b) >= 0) a else b
  private def cmp(ref: ColStats, a: String, b: String): Int = ref.typ match {
    case "string" => ColStats.compareUtf8(a, b) // parquet's binary stat order
    case _        => BigDecimal(a).compare(BigDecimal(b))
  }
}
