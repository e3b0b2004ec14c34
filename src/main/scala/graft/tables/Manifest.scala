package graft.tables

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One committed version of a [[ManagedTable]]: the schema, the partition
  * columns, and the exact data files (with their partition values and
  * column statistics) that make up the table at this version.
  *
  * This is the vanilla-Spark stand-in for a Delta transaction log snapshot:
  * readers never list data directories — they read the manifest and open
  * exactly the files it names, so partial writes are invisible until the
  * version pointer moves. Partition values and min/max column stats are
  * recorded per file, giving driver-side partition pruning AND data
  * skipping (Delta-style file stats) before the parquet scan ever opens a
  * footer.
  */

/** Per-file min/max for one column. `typ` ∈ long | double | string; values
  * are stringified in a lexicographically-safe way only for `string` —
  * numeric types compare through BigDecimal. */
final case class ColStats(typ: String, min: String, max: String) {

  /** Can a value in [lower, upper] (either side optional, inclusive)
    * possibly exist in this file? Non-comparable inputs (a numeric bound
    * against string stats or vice versa — whose Spark-filter CAST
    * semantics differ from the raw stats order — NaN/Infinity doubles,
    * unparsable values) conservatively return true: skipping is an
    * optimization and must never drop files. */
  def overlaps(lower: Option[Any], upper: Option[Any]): Boolean =
    overlapsBounds(lower.map(ColStats.Bound(_)), upper.map(ColStats.Bound(_)))

  /** [[overlaps]] against caller-prepared bounds. Manifest pruning
    * evaluates ONE bound against every file of the snapshot (1M entries
    * for a ~100 TB table), so the bound's parsed forms are hoisted into
    * [[ColStats.Bound]] once per query instead of re-derived per file,
    * and integral bounds against integral stats compare through a
    * zero-allocation `Long` fast path — the BigDecimal fallback keeps
    * the exact semantics for fractional/decimal inputs. */
  def overlapsBounds(
      lower: Option[ColStats.Bound], upper: Option[ColStats.Bound]): Boolean =
    try {
      // a bound only participates when its runtime type lives in the same
      // comparison domain as the stats; e.g. string stats "150" vs bound
      // 99 must NOT compare textually — Spark's filter would cast "150"
      // numerically and keep the row
      def comparable(b: ColStats.Bound): Boolean = typ match {
        case "string" => b.isString
        case _        => b.isNumber
      }
      // compare a stat string against the bound in the type's domain
      def cmp(stat: String, b: ColStats.Bound): Int = typ match {
        // parquet computed the min/max in unsigned UTF-8 byte order —
        // compare the same way (String.compareTo's UTF-16 order disagrees
        // beyond the BMP and would skip files that contain matches)
        case "string" => ColStats.compareUtf8Bytes(stat, b.utf8)
        case _ => b.asLong match {
          case Some(l) =>
            // exact-integer domain: identical ordering to the BigDecimal
            // compare below, no allocation
            try java.lang.Long.compare(java.lang.Long.parseLong(stat), l)
            catch { case _: NumberFormatException =>
              BigDecimal(stat).compare(b.asDecimal) }
          case None => BigDecimal(stat).compare(b.asDecimal)
        }
      }
      val loOk = lower.forall(l => !comparable(l) || cmp(max, l) >= 0)
      val hiOk = upper.forall(u => !comparable(u) || cmp(min, u) <= 0)
      loOk && hiOk
    } catch {
      case _: NumberFormatException => true
    }
}

object ColStats {
  /** Unsigned byte-wise UTF-8 comparison — parquet's binary stat order. */
  def compareUtf8(a: String, b: String): Int =
    compareUtf8Bytes(a, b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** [[compareUtf8]] against pre-encoded right-hand bytes (the bound side
    * of a prune is encoded once, the stat side per file). */
  def compareUtf8Bytes(a: String, y: Array[Byte]): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** A prune bound with its parsed forms computed once (see
    * [[ColStats.overlapsBounds]]): manifest pruning holds one bound
    * against every file entry of a snapshot, so nothing bound-derived
    * may be re-computed per file. */
  final class Bound(val raw: Any) {
    val isString: Boolean = raw.isInstanceOf[String]
    val isNumber: Boolean = raw.isInstanceOf[java.lang.Number] ||
      raw.isInstanceOf[scala.math.BigDecimal]
    /** Exact-integral value — enables the allocation-free fast path. */
    val asLong: Option[Long] = raw match {
      case l: java.lang.Long    => Some(l.longValue)
      case i: java.lang.Integer => Some(i.longValue)
      case s: java.lang.Short   => Some(s.longValue)
      case b: java.lang.Byte    => Some(b.longValue)
      case _                    => None
    }
    /** Decimal form; throws NumberFormatException for non-numeric raw —
      * callers' conservative catch keeps the file. */
    lazy val asDecimal: BigDecimal = BigDecimal(raw.toString)
    lazy val utf8: Array[Byte] =
      raw.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }
  object Bound { def apply(v: Any): Bound = new Bound(v) }
}

/** Streaming-writer transaction identity embedded in a commit record
  * (Delta's `SetTransaction` action equivalent): `appId` names the
  * writer (the streaming sink derives it from its checkpoint), `batchId`
  * the micro-batch this commit landed. Because it travels INSIDE the
  * record, it commits atomically with the data — a crash can never
  * separate "the batch's rows are in the table" from "the batch is
  * marked committed". [[ManagedTable.vacuum]] rolls these forward into
  * vacuum-exempt marker files before pruning records, so recovery
  * (`max(marker, newest embedded txn)`) never loses a committed batch.
  *
  * `expectedPrev` is a commit-time PRECONDITION, never serialized: when
  * set, the commit only proceeds if the app's newest recorded txn is
  * exactly this value (−1 encodes "none recorded"). Writers whose batch
  * CONTENT is derived from the recorded txn (matview refresh: the delta
  * covers `(anchor, cur]`) fence on the anchor this way — a plain
  * "batchId already recorded" check cannot catch a rival that applied a
  * shorter overlapping interval, because the rival's endpoint is lower
  * than ours. Dense sequential writers (the streaming sink, whose batch
  * content is checkpoint-determined) don't need it. */
final case class Txn(appId: String, batchId: Long,
    expectedPrev: Option[Long] = None)

/** @param rows exact PHYSICAL row count from the parquet footer at commit
  *   time — includes rows a deletion vector has since masked ([[dv]]); the
  *   live count is `rows - dvRows`. None for files adopted without footer
  *   reads ([[ManagedTable.importFiles]] callers may supply it;
  *   `collectStatistics()` backfills). Metadata-only `count(*)`
  *   ([[ManagedTable.fastCount]]) needs every file to carry it.
  * @param bytes on-disk size recorded at commit time (Delta's
  *   AddFile.size): maintenance and streaming admission control price
  *   files from the manifest instead of one namenode RPC per file. None
  *   for entries adopted before sizes were recorded — callers fall back
  *   to [[ManagedTable.fileLen]].
  * @param dv deletion-vector reference (Delta's merge-on-read DV): the
  *   name of a parquet sidecar under `_graft/_dv/` holding
  *   `(file basename, row position)` pairs masked out of this file at
  *   read time — a row-level DELETE/UPDATE commits one small sidecar
  *   instead of rewriting the data file. Absolute URIs are honoured
  *   as-is (shallow clones reference the source table's sidecars). The
  *   sidecar may carry positions for OTHER files of the same commit;
  *   only pairs matching this file's basename apply to it.
  * @param dvRows number of masked positions for THIS file — always
  *   recorded with [[dv]] so live counts and deleted-fraction decisions
  *   never read the sidecar.
  * @param baseRowId row-tracking base (Delta's AddFile.baseRowId): row i
  *   of this file has the stable row ID `baseRowId + i` unless the file
  *   carries a materialized `_graft_row_id` column (rewrites preserve
  *   IDs that way). Allocated from the table's high watermark at commit
  *   time while `graft.rowTracking.enabled`; None on files committed
  *   before enablement or adopted without a recorded row count.
  * @param dataVersion version of the commit that introduced this file
  *   (Delta's defaultRowCommitVersion): the per-row "last modified"
  *   fallback — a row's commit version is its materialized
  *   `_graft_row_cv` when a rewrite carried one, else the file's
  *   dataVersion. Preserved verbatim when an entry re-commits without
  *   content change (DV re-masks, restores); stamped at commit time on
  *   every new entry. */
/** Delta-style column mapping: logical (user-visible) column names decouple
  * from the physical names stored inside parquet files, making RENAME and
  * DROP COLUMN metadata-only commits — at 100 TB a rename must not rewrite
  * a byte. Inactive (absent from the record) ⇔ physical == logical, which
  * is every table until its first rename/drop; activation snapshots an
  * identity map over the then-current schema, so pre-activation files need
  * no translation either.
  *
  * @param byLogical physical name for EVERY logical field while active
  * @param retired physical names of dropped columns — still present inside
  *   old data files, so they stay reserved forever: a later column with a
  *   colliding name gets a uniquified physical instead of resurrecting the
  *   dropped column's bytes */
final case class ColumnMapping(
    byLogical: Map[String, String], retired: Seq[String] = Nil) {
  def physical(logical: String): String = byLogical.getOrElse(logical, logical)
  /** Physical names that may never be assigned to a new column. */
  def reserved: Set[String] = byLogical.values.toSet ++ retired
}

/** @param nullCounts exact per-column null counts from the footer
  *   (Delta's stats.nullCount): recorded even for columns with no
  *   min/max entry (an all-null column has no extrema but a definite
  *   null count), capped to the same indexed-column set as [[stats]].
  *   Powers IS NULL / IS NOT NULL file skipping and metadata-exact
  *   `count(col)`. Absent key ⇔ unknown (old manifests, unreadable
  *   footers) — consumers must treat unknown conservatively. */
final case class TableFile(
    path: String,
    partitionValues: Map[String, String],
    stats: Map[String, ColStats] = Map.empty,
    rows: Option[Long] = None,
    bytes: Option[Long] = None,
    dv: Option[String] = None,
    dvRows: Option[Long] = None,
    baseRowId: Option[Long] = None,
    dataVersion: Option[Long] = None,
    nullCounts: Map[String, Long] = Map.empty) {

  /** Live rows (physical minus DV-masked), when the physical count is
    * known. */
  def liveRows: Option[Long] = rows.map(_ - dvRows.getOrElse(0L))
}

/** @param filesRef when set, the file list lives in a parquet sidecar of
  *   this name next to the record (large-table checkpoints: the list is
  *   written and parsed as a distributed parquet dataset instead of
  *   driver-serialized JSON); `files` is then empty in the on-disk record
  *   and populated by [[ManagedTable.readManifest]]. */
final case class Manifest(
    version: Long,
    schemaJson: String,
    partitionColumns: Seq[String],
    files: Seq[TableFile],
    operation: String,
    timestampMs: Long,
    filesRef: Option[String] = None,
    txn: Option[Txn] = None,
    constraints: Map[String, String] = Map.empty,
    metrics: Map[String, Long] = Map.empty,
    columnMapping: Option[ColumnMapping] = None,
    generated: Map[String, String] = Map.empty,
    properties: Map[String, String] = Map.empty) {

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  /** Physical parquet name of a logical column (identity until mapping
    * activates — see [[ColumnMapping]]). */
  def physicalName(logical: String): String =
    columnMapping.fold(logical)(_.physical(logical))

  /** The schema as stored inside this version's data files. */
  def physicalSchema: StructType = columnMapping.fold(schema)(cm =>
    StructType(schema.fields.map(f => f.copy(name = cm.physical(f.name)))))

  def toJsonString: String = {
    val base = List(
      "version" -> JLong(version),
      "schemaJson" -> JString(schemaJson),
      "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList),
      "operation" -> JString(operation),
      "timestampMs" -> JLong(timestampMs)) ++
      Manifest.txnToJson(txn) ++
      Manifest.constraintsToJson(constraints) ++
      Manifest.metricsToJson(metrics) ++
      Manifest.mappingToJson(columnMapping) ++
      Manifest.generatedToJson(generated) ++
      Manifest.propertiesToJson(properties)
    val j = JObject(base ++ (filesRef match {
      case Some(ref) => List("filesRef" -> JString(ref))
      case None      => List("files" -> Manifest.filesToJson(files))
    }))
    JsonMethods.compact(JsonMethods.render(j))
  }
}

/** One on-disk manifest record: either a full snapshot (checkpoint — the
  * original format, still what readers of old tables find) or an
  * incremental delta against `baseVersion` (adds + removed paths). A
  * commit that touches one partition of a million-file table writes
  * O(touched files), not O(table); [[graft.tables.ManagedTable]] writes a
  * full checkpoint every [[Manifest.CheckpointInterval]] versions to bound
  * reconstruction chains. */
final case class IncrementalManifest(
    version: Long,
    schemaJson: String,
    partitionColumns: Seq[String],
    baseVersion: Long,
    adds: Seq[TableFile],
    removes: Seq[String],
    operation: String,
    timestampMs: Long,
    txn: Option[Txn] = None,
    constraints: Map[String, String] = Map.empty,
    metrics: Map[String, Long] = Map.empty,
    columnMapping: Option[ColumnMapping] = None,
    generated: Map[String, String] = Map.empty,
    properties: Map[String, String] = Map.empty) {

  def toJsonString: String = {
    val j = JObject(List(
      "version" -> (JLong(version): JValue),
      "schemaJson" -> JString(schemaJson),
      "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList),
      "baseVersion" -> JLong(baseVersion),
      "operation" -> JString(operation),
      "timestampMs" -> JLong(timestampMs)) ++
      Manifest.txnToJson(txn) ++
      Manifest.constraintsToJson(constraints) ++
      Manifest.metricsToJson(metrics) ++
      Manifest.mappingToJson(columnMapping) ++
      Manifest.generatedToJson(generated) ++
      Manifest.propertiesToJson(properties) ++ List(
      "adds" -> (Manifest.filesToJson(adds): JValue),
      "removes" -> JArray(removes.map(JString(_)).toList)))
    JsonMethods.compact(JsonMethods.render(j))
  }

  /** Apply this delta to the base snapshot. */
  def applyTo(base: Manifest): Manifest = {
    val removed = removes.toSet
    Manifest(version, schemaJson, partitionColumns,
      base.files.filterNot(f => removed.contains(f.path)) ++ adds,
      operation, timestampMs, txn = txn, constraints = constraints,
      metrics = metrics, columnMapping = columnMapping, generated = generated,
      properties = properties)
  }
}

object Manifest {

  /** Every Nth version is written as a full checkpoint, bounding the
    * record chain a reader reconstructs. */
  val CheckpointInterval = 10

  /** Newest record format this reader understands. Records omit the
    * `format` field while it is 1 (= every record written so far, so old
    * tables and old readers interoperate); the first format-2 WRITER will
    * stamp it, and format-1 readers then refuse cleanly instead of
    * misreading ([[recordFromJsonString]]). */
  val CurrentFormat = 1L

  private[tables] def txnToJson(txn: Option[Txn]): List[(String, JValue)] =
    txn.map(t => "txn" -> (JObject(
      "app" -> JString(t.appId), "batch" -> JLong(t.batchId)): JValue)).toList

  private def txnFromJson(v: JValue): Option[Txn] = v match {
    case JObject(_) => Some(Txn(str(v \ "app"), lng(v \ "batch")))
    case _          => None
  }

  /** CHECK constraints travel in every record (absent key ⇔ none — old
    * records parse unchanged) so the active set is time-travel
    * consistent with the data it governed. */
  private[tables] def constraintsToJson(
      cs: Map[String, String]): List[(String, JValue)] =
    if (cs.isEmpty) Nil
    else List("constraints" -> JObject(
      cs.map { case (n, e) => n -> (JString(e): JValue) }.toList))

  private def constraintsFromJson(v: JValue): Map[String, String] = v match {
    case JObject(kvs) => kvs.map { case (n, e) => n -> str(e) }.toMap
    case _            => Map.empty
  }

  /** Per-commit operation metrics (Delta's `operationMetrics`): what the
    * COMMIT did (files/rows/bytes added, files removed), not table
    * totals. Absent key ⇔ none — old records parse unchanged. */
  private[tables] def metricsToJson(
      ms: Map[String, Long]): List[(String, JValue)] =
    if (ms.isEmpty) Nil
    else List("metrics" -> JObject(
      ms.toList.sortBy(_._1).map { case (n, v) => n -> (JLong(v): JValue) }))

  private def metricsFromJson(v: JValue): Map[String, Long] = v match {
    case JObject(kvs) => kvs.map { case (n, x) => n -> lng(x) }.toMap
    case _            => Map.empty
  }

  /** Column mapping travels in every record (absent key ⇔ inactive — old
    * records parse unchanged) so each version reads its files through
    * the mapping that was live when they were committed. */
  private[tables] def mappingToJson(
      cm: Option[ColumnMapping]): List[(String, JValue)] =
    cm.map { c =>
      "columnMapping" -> (JObject(
        "map" -> JObject(
          c.byLogical.toList.sortBy(_._1).map { case (l, p) =>
            l -> (JString(p): JValue) }),
        "retired" -> JArray(c.retired.map(JString(_)).toList)): JValue)
    }.toList

  /** Generated-column rules (column → SQL expression) travel in every
    * record like constraints (absent key ⇔ none — old records parse
    * unchanged), so each version knows the invariants its data satisfies. */
  private[tables] def generatedToJson(
      gs: Map[String, String]): List[(String, JValue)] =
    if (gs.isEmpty) Nil
    else List("generated" -> JObject(
      gs.toList.sortBy(_._1).map { case (n, e) => n -> (JString(e): JValue) }))

  private def generatedFromJson(v: JValue): Map[String, String] = v match {
    case JObject(kvs) => kvs.map { case (n, e) => n -> str(e) }.toMap
    case _            => Map.empty
  }

  /** Table properties (Delta TBLPROPERTIES): per-table configuration that
    * travels in every record like constraints (absent key ⇔ none — old
    * records parse unchanged), so each version knows the configuration it
    * was written under. */
  private[tables] def propertiesToJson(
      ps: Map[String, String]): List[(String, JValue)] =
    if (ps.isEmpty) Nil
    else List("properties" -> JObject(
      ps.toList.sortBy(_._1).map { case (n, e) => n -> (JString(e): JValue) }))

  private def propertiesFromJson(v: JValue): Map[String, String] = v match {
    case JObject(kvs) => kvs.map { case (n, e) => n -> str(e) }.toMap
    case _            => Map.empty
  }

  private def mappingFromJson(v: JValue): Option[ColumnMapping] = v match {
    case JObject(_) =>
      val m = (v \ "map") match {
        case JObject(kvs) => kvs.map { case (l, p) => l -> str(p) }.toMap
        case _            => Map.empty[String, String]
      }
      val r = (v \ "retired") match {
        case JArray(xs) => xs.map(str)
        case _          => Nil
      }
      Some(ColumnMapping(m, r))
    case _ => None
  }

  private[tables] def filesToJson(files: Seq[TableFile]): JArray =
    JArray(files.map { f =>
      JObject(List(
        "path" -> JString(f.path),
        "partitionValues" -> JObject(
          f.partitionValues.map { case (k, v) => k -> JString(v) }.toList),
        "stats" -> JObject(f.stats.map { case (c, s) =>
          c -> JObject(
            "t" -> JString(s.typ),
            "min" -> JString(s.min),
            "max" -> JString(s.max))
        }.toList)) ++
        f.rows.map(r => "rows" -> (JLong(r): JValue)).toList ++
        f.bytes.map(b => "bytes" -> (JLong(b): JValue)).toList ++
        f.dv.map(d => "dv" -> (JString(d): JValue)).toList ++
        f.dvRows.map(n => "dvRows" -> (JLong(n): JValue)).toList ++
        f.baseRowId.map(b => "baseRow" -> (JLong(b): JValue)).toList ++
        f.dataVersion.map(v => "dataV" -> (JLong(v): JValue)).toList ++
        (if (f.nullCounts.isEmpty) Nil
         else List("nulls" -> (JObject(f.nullCounts.toList.sortBy(_._1)
           .map { case (c, n) => c -> (JLong(n): JValue) }): JValue))))
    }.toList)

  private def str(v: JValue): String = v match { case JString(x) => x; case _ => "" }
  private def lng(v: JValue): Long = v match {
    case JLong(x) => x; case JInt(x) => x.toLong; case _ => 0L
  }

  private def filesFromJson(v: JValue): Seq[TableFile] = v match {
    case JArray(fs) => fs.map { f =>
      TableFile(
        str(f \ "path"),
        (f \ "partitionValues") match {
          case JObject(kvs) => kvs.map { case (k, v) => k -> str(v) }.toMap
          case _            => Map.empty[String, String]
        },
        (f \ "stats") match {
          case JObject(kvs) => kvs.map { case (c, v) =>
            c -> ColStats(str(v \ "t"), str(v \ "min"), str(v \ "max"))
          }.toMap
          case _ => Map.empty[String, ColStats]
        },
        (f \ "rows") match {
          case JLong(x) => Some(x)
          case JInt(x)  => Some(x.toLong)
          case _        => None
        },
        (f \ "bytes") match {
          case JLong(x) => Some(x)
          case JInt(x)  => Some(x.toLong)
          case _        => None
        },
        (f \ "dv") match {
          case JString(d) => Some(d)
          case _          => None
        },
        (f \ "dvRows") match {
          case JLong(x) => Some(x)
          case JInt(x)  => Some(x.toLong)
          case _        => None
        },
        (f \ "baseRow") match {
          case JLong(x) => Some(x)
          case JInt(x)  => Some(x.toLong)
          case _        => None
        },
        (f \ "dataV") match {
          case JLong(x) => Some(x)
          case JInt(x)  => Some(x.toLong)
          case _        => None
        },
        (f \ "nulls") match {
          case JObject(kvs) => kvs.map { case (c, n) => c -> lng(n) }.toMap
          case _            => Map.empty[String, Long]
        })
    }
    case _ => Nil
  }

  /** Parse a record: `baseVersion` present ⇒ incremental delta, else full
    * snapshot (the original round-1 format — old tables read unchanged). */
  def recordFromJsonString(s: String): Either[Manifest, IncrementalManifest] = {
    val j = JsonMethods.parse(s)
    // forward-compat guard (Delta's reader protocol version): a record
    // stamped by a future writer with semantics this reader cannot honor
    // (absent = format 1, every record ever written so far) must fail
    // loudly, not read a table it would misinterpret
    (j \ "format") match {
      case JNothing | JNull => ()
      case f =>
        val fv = lng(f)
        if (fv > CurrentFormat) throw new IllegalArgumentException(
          s"manifest record uses format $fv but this reader supports up " +
            s"to $CurrentFormat — upgrade the library to read this table")
    }
    val common = (
      lng(j \ "version"), str(j \ "schemaJson"),
      (j \ "partitionColumns") match { case JArray(xs) => xs.map(str); case _ => Nil },
      str(j \ "operation"), lng(j \ "timestampMs"))
    (j \ "baseVersion") match {
      case JNothing | JNull =>
        val ref = (j \ "filesRef") match {
          case JString(r) => Some(r)
          case _          => None
        }
        Left(Manifest(common._1, common._2, common._3,
          filesFromJson(j \ "files"), common._4, common._5, ref,
          txnFromJson(j \ "txn"), constraintsFromJson(j \ "constraints"),
          metricsFromJson(j \ "metrics"),
          mappingFromJson(j \ "columnMapping"),
          generatedFromJson(j \ "generated"),
          propertiesFromJson(j \ "properties")))
      case bv =>
        Right(IncrementalManifest(common._1, common._2, common._3, lng(bv),
          filesFromJson(j \ "adds"),
          (j \ "removes") match { case JArray(xs) => xs.map(str); case _ => Nil },
          common._4, common._5, txnFromJson(j \ "txn"),
          constraintsFromJson(j \ "constraints"),
          metricsFromJson(j \ "metrics"),
          mappingFromJson(j \ "columnMapping"),
          generatedFromJson(j \ "generated"),
          propertiesFromJson(j \ "properties")))
    }
  }

  def fromJsonString(s: String): Manifest =
    recordFromJsonString(s) match {
      case Left(m) => m
      case Right(inc) => throw new IllegalArgumentException(
        s"Manifest v${inc.version} is incremental (base v${inc.baseVersion}); " +
          "reconstruct through ManagedTable.readManifest")
    }
}
