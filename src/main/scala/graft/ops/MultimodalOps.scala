package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media are opaque `binary` columns travelling next to typed metadata;
  * decode / feature-extraction runs partition-wise so a real decoder
  * (JNI image lib, ffmpeg pipe, …) is initialized once per partition and
  * fed batches — the Spark-side contract (schema, partitioning, batch
  * shape) is real and tested, while the decoder itself is a STUB: this
  * container has no media libraries, so [[MultimodalOps.decodeStub]]
  * derives deterministic fake dimensions/samples from the payload bytes.
  * Swapping in a real decoder changes only that one function.
  *
  * At 100 TB: payloads dominate row size, so ops `repartition` by byte
  * budget rather than row count before partition-wise decode, and
  * metadata-only transformations never touch the payload column (column
  * pruning keeps it out of the scan entirely).
  */
object MultimodalOps {

  /** Typed metadata carried beside every media payload. */
  final case class MediaMeta(
      mediaType: String,
      nBytes: Long,
      contentSha: String,
      width: Int,
      height: Int)

  final case class MediaRecord(id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Feature row produced by partition-wise decode: fixed-length float
    * vector + provenance. */
  final case class MediaFeatures(id: Long, features: Array[Float], nFrames: Int)

  /** STUB decoder — a real implementation would hand `payload` to an
    * image/audio library. Deterministic fake: dimensions and "frames"
    * derived from the payload hash so tests are stable. */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
    val hex = sha.map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    MediaMeta(
      mediaType = if (h % 3 == 0) "image" else if (h % 3 == 1) "audio" else "video",
      nBytes = payload.length.toLong,
      contentSha = hex,
      width = (h % 1920).toInt,
      height = (h % 1080).toInt)
  }

  /** STUB feature extractor: 8 floats folded from payload bytes — stands in
    * for an embedding/mel-spectrogram computed per decoded frame. */
  def featureStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Float](dims)
    var i = 0
    while (i < payload.length) {
      acc(i % dims) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Pack a text column as a binary payload with populated metadata —
    * the ingest-side shape (in production the payload arrives as raw
    * bytes from the object store). */
  def pack(df: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), encode(col(textCol), "UTF-8"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition block: one decoder instance per partition in a
        // real implementation
        it.map { case (id, payload) => MediaRecord(id, payload, decodeStub(payload)) }
      }
  }

  /** Partition-wise decode + feature extraction. `mapPartitions` (not a
    * per-row UDF) so decoder setup amortizes and batches can be formed —
    * the Spark-native analogue of a batched pandas-UDF pipeline. */
  def extractFeatures(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.id, featureStub(r.payload),
          nFrames = (r.meta.nBytes / 64 + 1).toInt)
      }
    }
  }

  /** Deterministic frame sampling: every `stride`-th 64-byte window of the
    * payload (stands in for video frame sampling; same batch shape). */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int)(
      implicit spark: SparkSession): Dataset[(Long, Int, Array[Byte])] = {
    require(stride > 0, "stride must be positive") // fail on the driver,
    // not with a per-row ArithmeticException inside an executor task
    import spark.implicits._
    records.flatMap { r =>
      r.payload.grouped(64).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => (r.id, idx, frame)
      }
    }
  }

  /** Metadata-only projection: never deserializes payloads — at scale the
    * parquet scan prunes the binary column entirely. */
  def metadataOnly(records: Dataset[MediaRecord])(
      implicit spark: SparkSession): DataFrame =
    records.toDF().select(col("id"), col("meta.*"))

  /** Repartition by BYTE budget, not row count: media rows vary from KB to
    * GB, so row-count partitioning makes decode tasks wildly uneven. Uses
    * recorded payload sizes to pick a partition count targeting
    * `targetBytesPerPartition` per task. */
  def repartitionByBytes(
      records: Dataset[MediaRecord], targetBytesPerPartition: Long)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import org.apache.spark.sql.functions.sum
    val row = records.toDF().agg(sum(col("meta.nBytes"))).head()
    if (row.isNullAt(0)) records // empty dataset: nothing to rebalance
    else {
      val total = row.getLong(0)
      val parts = math.max(1, math.ceil(total.toDouble / targetBytesPerPartition).toInt)
      records.repartition(parts)
    }
  }
}
