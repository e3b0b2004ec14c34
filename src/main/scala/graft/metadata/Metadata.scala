package graft.metadata

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.time.{LocalDate, ZoneId}

/** Parsed metadata: environment + connections + entities, with O(1) lookups,
  * the environment→connection→entity settings cascade, and `${var}` path
  * interpolation.
  *
  * The reference evaluates path templates with a runtime Scala ToolBox
  * compiler (reference: src/main/scala/datalake/core/Expressions.scala:66-94);
  * we deliberately use plain `${var}` substitution instead — scala-compiler
  * is not a safe cluster dependency and nothing in the documented templates
  * needs more than substitution.
  */
final class Metadata(
    val environment: Environment,
    val connections: Seq[Connection],
    val entities: Seq[Entity]) {

  private val entityById: Map[Int, Entity] = {
    val dup = entities.groupBy(_.id).collect { case (id, es) if es.size > 1 => id }
    if (dup.nonEmpty)
      throw new MetadataException(s"Duplicate entity ids: ${dup.mkString(", ")}")
    entities.map(e => e.id -> e).toMap
  }
  private val connectionByName: Map[String, Connection] =
    connections.map(c => c.name.toLowerCase -> c).toMap

  // load-time contract checks: a typo'd connection name would silently
  // drop that connection's settings from the cascade, and a keyed
  // process type (merge/delta/historic) without a businesskey column
  // would only fail rounds later inside the merge plan with an
  // unresolved-column error — both fail HERE with the entity named.
  // ONLY ENABLED entities fail the load (the reference resolves
  // connections lazily, Entity.scala:88, so a parked entity never
  // blocks it either); violations on disabled entities — including an
  // entity whose connection field is absent — log a warning so the
  // problem is visible before someone re-enables them, but one parked
  // entity cannot block loading the whole config
  locally {
    def violations(es: Seq[Entity]): Seq[String] = {
      val badConn = es.filter(e =>
        !connectionByName.contains(e.connection.toLowerCase))
        .map(e => s"entity '${e.name}': unknown connection " +
          s"'${e.connection}'")
      val keyless = es.filter(e =>
        e.processType != ProcessType.Full && e.businessKeyColumns.isEmpty)
        .map(e => s"entity '${e.name}': processtype " +
          s"'${e.processType.toString.toLowerCase}' requires at least one " +
          "column with the businesskey fieldrole")
      badConn ++ keyless
    }
    // enabled = entity flag ∧ its connection's flag (when resolvable)
    val (active, parked) = entities.partition(e =>
      e.enabled &&
        connectionByName.get(e.connection.toLowerCase).forall(_.enabled))
    val hard = violations(active)
    if (hard.nonEmpty)
      throw new MetadataException(hard.mkString("; "))
    val soft = violations(parked)
    if (soft.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(classOf[Metadata]).warn(
        "metadata violations on DISABLED entities (load continues; fix " +
          "before re-enabling): " + soft.mkString("; "))
  }

  def getEntity(id: Int): Entity =
    entityById.getOrElse(id, throw new EntityNotFoundException(s"Entity $id not found"))
  def getConnection(name: String): Connection =
    connectionByName.getOrElse(name.toLowerCase,
      throw new ConnectionNotFoundException(s"Connection '$name' not found"))

  def getEntitiesByConnection(connection: String): Seq[Entity] =
    entities.filter(_.connection.equalsIgnoreCase(connection))
  def getEntitiesByGroup(group: String): Seq[Entity] =
    entities.filter(_.group.equalsIgnoreCase(group))

  /** entity.enabled ∧ connection.enabled (reference: Entity.scala:81-82). */
  def isEnabled(e: Entity): Boolean =
    e.enabled && connectionByName.get(e.connection.toLowerCase).forall(_.enabled)

  /** Settings cascade environment → connection → entity via JObject merge
    * (reference: Entity.scala:124-127). */
  def resolvedSettings(e: Entity): JObject = {
    val conn = connectionByName.get(e.connection.toLowerCase)
      .map(_.settings).getOrElse(JObject())
    environment.settings.merge(conn).merge(e.settings)
  }

  /** `${var}` interpolation over path/table templates
    * (reference: Entity.scala:237-257). Supported vars: today, entity,
    * destination, connection, root_folder, settings_<key>. */
  def interpolate(template: String, e: Entity): String = {
    val settings = resolvedSettings(e)
    val today = LocalDate.now(ZoneId.of(environment.timezone)).toString
    val base = Map(
      "today" -> today,
      "entity" -> e.name,
      "destination" -> e.destination,
      "connection" -> e.connection,
      "root_folder" -> environment.rootFolder)
    "\\$\\{([A-Za-z0-9_]+)\\}".r.replaceAllIn(template, m => {
      val key = m.group(1)
      val v = base.getOrElse(key,
        if (key.startsWith("settings_"))
          settings \ key.stripPrefix("settings_") match {
            case JString(s) => s
            case JInt(i)    => i.toString
            case _          => m.matched
          }
        else m.matched)
      java.util.regex.Matcher.quoteReplacement(v)
    })
  }

  def bronzePath(e: Entity): String = {
    val t = resolvedSettings(e) \ "bronze_path" match {
      case JString(s) => s
      case _          => environment.bronzePath
    }
    applySecureSuffix(interpolate(t, e), e, "bronze")
  }

  /** Secure entities get `environment.secureContainerSuffix` appended to
    * their bronze/silver layer segment (reference: Entity.scala:197-206,
    * Environment.scala:84-85): `.../bronze/...` → `.../bronze<suffix>/...`.
    * The reference appends the suffix right after the fixed
    * `<root>/<layer>` prefix; our templates carry the layer as a path
    * segment, so the first segment equal to the layer name is rewritten. */
  private def applySecureSuffix(path: String, e: Entity, layer: String): String =
    if (!e.isSecure || environment.secureContainerSuffix.isEmpty) path
    else {
      // search only BELOW the root folder: a root path segment that
      // happens to be named "bronze"/"silver" (e.g. /mnt/bronze) must not
      // swallow the suffix meant for the layer directory — the reference
      // appends right after <root>/<layer>
      val root = environment.rootFolder
      val (head, tail) =
        if (root.nonEmpty && path.startsWith(root)) (root, path.drop(root.length))
        else ("", path)
      val segs = tail.split("/", -1)
      val i = segs.indexWhere(_ == layer)
      if (i < 0) path
      else {
        segs(i) = segs(i) + environment.secureContainerSuffix
        head + segs.mkString("/")
      }
    }

  /** Per-invocation run logger over ONE lazily-created shared sink:
    * every processing run gets a FRESH run_id (reference:
    * DatalakeLogManager.scala:13-38 creates a run id per run), while the
    * buffered sink — and its flush batching — is shared across runs and
    * entities. A `log_table` environment setting selects the catalog-table
    * VARIANT sink (reference: TableAppender.scala:104-155); else `log_path`
    * selects the Parquet sink; neither → no logging. */
  @volatile private var sinkCache: Option[graft.log.LogSink] = None
  def runLogger(spark: org.apache.spark.sql.SparkSession): Option[graft.log.RunLogger] = {
    def sharedSink(mk: => graft.log.LogSink): graft.log.LogSink = {
      if (sinkCache.isEmpty) synchronized {
        if (sinkCache.isEmpty) sinkCache = Some(mk)
      }
      sinkCache.get
    }
    environment.settings \ "log_table" match {
      case JString(t) if t.nonEmpty =>
        Some(new graft.log.RunLogger(sharedSink(
          new graft.log.TableLogSink(spark, t))))
      case _ => environment.settings \ "log_path" match {
        case JString(p) if p.nonEmpty =>
          Some(new graft.log.RunLogger(sharedSink(
            new graft.log.ParquetLogSink(spark, interpolateEnv(p)))))
        case _ => None
      }
    }
  }

  private def interpolateEnv(template: String): String =
    template.replace("${root_folder}", environment.rootFolder)

  /** Silver output: `silver_table` setting → catalog table, else path
    * (reference: Entity.scala:145-192 semantics). The secure suffix
    * applies to path locations only — catalog names have no container
    * (reference suffixes paths at Entity.scala:204-206). */
  def silverLocation(e: Entity): OutputLocation =
    resolvedSettings(e) \ "silver_table" match {
      case JString(t) if t.nonEmpty => TableLocation(interpolate(t, e))
      case _ =>
        val t = resolvedSettings(e) \ "silver_path" match {
          case JString(s) => s
          case _          => environment.silverPath
        }
        PathLocation(applySecureSuffix(interpolate(t, e), e, "silver"))
    }
}

object Metadata {

  /** Parse from a raw JSON string (reference: StringMetadataSettings /
    * DatalakeMetadataSettings.scala:37-62). */
  def fromJson(json: String): Metadata = {
    val root = JsonMethods.parse(json)
    val env = parseEnvironment(root \ "environment")
    val conns = root \ "connections" match {
      case JArray(cs) => cs.map(parseConnection)
      case _          => Nil
    }
    val ents = root \ "entities" match {
      case JArray(es) => es.map(parseEntity)
      case _          => Nil
    }
    new Metadata(env, conns, ents)
  }

  /** Load one JSON file (any Hadoop-visible FS) — reference:
    * JsonMetadataSettings.scala:8-15. */
  def fromFile(spark: org.apache.spark.sql.SparkSession, path: String): Metadata = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try fromJson(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Load config JSON from a JDBC source (reference:
    * SqlMetadataSettings.scala:27-51 — `SELECT config FROM
    * cfg.fnGetFoundationConfig()` on SQL Server). Driver-agnostic: any
    * JDBC driver on the classpath works; the query must return one row
    * whose first column is the full metadata JSON document. */
  def fromJdbc(
      spark: org.apache.spark.sql.SparkSession,
      url: String,
      query: String,
      connectionProperties: Map[String, String] = Map.empty): Metadata = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    val json = connectionProperties.foldLeft(reader) {
      case (r, (k, v)) => r.option(k, v)
    }.load().head().getString(0)
    fromJson(json)
  }

  /** Merge every `*.json` in a folder (reference:
    * JsonFolderMetadataSettings.scala:11-33). */
  def fromFolder(spark: org.apache.spark.sql.SparkSession, dir: String): Metadata = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".json"))
      .sortBy(_.getPath.getName)
    val merged = files.foldLeft(JObject(): JValue) { (acc, f) =>
      val in = fs.open(f.getPath)
      val j = try JsonMethods.parse(
        new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
      acc.merge(j)
    }
    val env = parseEnvironment(merged \ "environment")
    val conns = merged \ "connections" match {
      case JArray(cs) => cs.map(parseConnection); case _ => Nil
    }
    val ents = merged \ "entities" match {
      case JArray(es) => es.map(parseEntity); case _ => Nil
    }
    new Metadata(env, conns, ents)
  }

  private def str(j: JValue, default: String = ""): String = j match {
    case JString(s) => s
    case JInt(i)    => i.toString
    case _          => default
  }
  private def optStr(j: JValue): Option[String] = j match {
    case JString(s) if s.nonEmpty => Some(s)
    case _                        => None
  }
  private def bool(j: JValue, default: Boolean): Boolean = j match {
    case JBool(b)   => b
    case JString(s) => s.equalsIgnoreCase("true")
    case _          => default
  }
  private def obj(j: JValue): JObject = j match {
    case o: JObject => o
    case _          => JObject()
  }

  private def parseEnvironment(j: JValue): Environment = {
    val d = Environment()
    Environment(
      name = str(j \ "name", d.name),
      timezone = str(j \ "timezone", d.timezone),
      rootFolder = str(j \ "root_folder", d.rootFolder),
      rawPath = str(j \ "raw_path", d.rawPath),
      bronzePath = str(j \ "bronze_path", d.bronzePath),
      silverPath = str(j \ "silver_path", d.silverPath),
      systemFieldPrefix = str(j \ "systemfield_prefix", d.systemFieldPrefix),
      secureContainerSuffix =
        str(j \ "secure_container_suffix", d.secureContainerSuffix),
      settings = obj(j \ "settings"))
  }

  private def parseConnection(j: JValue): Connection =
    Connection(
      name = str(j \ "name"),
      enabled = bool(j \ "enabled", default = true),
      settings = obj(j \ "settings"))

  private def parseColumn(j: JValue): EntityColumn =
    EntityColumn(
      name = str(j \ "name"),
      newName = optStr(j \ "newname"),
      dataTypeName = optStr(j \ "datatype"),
      fieldRoles = j \ "fieldroles" match {
        case JArray(rs) => rs.map(str(_))
        case _          => Nil
      },
      expression = optStr(j \ "expression"))

  private def parseWatermark(j: JValue): WatermarkDef =
    WatermarkDef(
      columnName = str(j \ "column"),
      operation = str(j \ "operation", ">="),
      expression = str(j \ "expression", "'${last_value}'"))

  private def parseEntity(j: JValue): Entity =
    Entity(
      id = j \ "id" match {
        case JInt(i) => i.toInt
        case JString(s) => s.toInt
        case _ => throw new MetadataException(s"Entity missing id: ${JsonMethods.compact(j)}")
      },
      name = str(j \ "name"),
      enabled = bool(j \ "enabled", default = true),
      connection = str(j \ "connection"),
      group = str(j \ "group"),
      destinationOverride = optStr(j \ "destination"),
      secure = j \ "secure" match {
        case JBool(b)   => Some(b)
        case JString(s) => Some(s.equalsIgnoreCase("true"))
        case _          => None
      },
      processType = ProcessType.parse(str(j \ "processtype", "full")),
      watermark = j \ "watermark" match {
        case JArray(ws) => ws.map(parseWatermark)
        case o: JObject => Seq(parseWatermark(o))
        case _          => Nil
      },
      columns = j \ "columns" match {
        case JArray(cs) => cs.map(parseColumn)
        case _          => Nil
      },
      settings = obj(j \ "settings"),
      transformations = j \ "transformations" match {
        case JArray(ts) => ts.map {
          case JString(s) => EntityTransformation(Seq(s))
          case t => t \ "expressions" match {
            case JArray(es) => EntityTransformation(es.map(str(_)))
            case _          => EntityTransformation(Nil)
          }
        }
        case _ => Nil
      })
}
