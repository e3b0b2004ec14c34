package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.queries.Tables

/** Scratch stage-level profiler for bench hotspots (not part of the API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val df = Tables.documents(spark, sfDir)
    time("warm read")(df.count())

    // stage-by-stage of minHashNearDupPairs
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col("doc_id").as("__id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("__pos", "__w")))
    time("tokenize+explode")(tok.count())
    val wh = tok.select(col("__id"), col("__pos"),
      TextOps.portableHash(col("__w")).as("__h"))
    time("sha-per-word")(wh.count())
    val w = Window.partitionBy("__id").orderBy("__pos")
    val sets = wh.withColumn("__h2", lead("__h", 1).over(w))
      .filter(col("__h2").isNotNull)
      .select(col("__id"),
        pmod(col("__h") * 1000003L + col("__h2"), lit(TextOps.ShingleMod)).as("__s"))
      .groupBy("__id").agg(collect_set(col("__s")).as("__hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingleSets persist")(sets.count())
    val sigs = sets.select(col("__id"), TextOps.minHashSignature(col("__hs")).as("__sig"))
    time("minhash sigs")(sigs.count())
    val bands = sigs.select(col("__id"), posexplode(TextOps.bandKeys(col("__sig"))))
      .select(col("__id"), concat_ws("#", col("pos"), col("col")).as("__band"))
    time("band keys")(bands.count())
    val pairs = bands.alias("a").join(bands.alias("b"),
        col("a.__band") === col("b.__band") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b")).distinct()
    time("band self-join pairs")(pairs.count())
    val s2 = sets.select(col("__id"), col("__hs"))
    val full = pairs
      .join(s2.withColumnRenamed("__id", "id_a").withColumnRenamed("__hs", "hs_a"), "id_a")
      .join(s2.withColumnRenamed("__id", "id_b").withColumnRenamed("__hs", "hs_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).as("inter"))
    time("jaccard joins")(full.count())

    time("FULL minHashNearDupPairs")(
      TextOps.minHashNearDupPairs(Tables.documents(spark, sfDir), "doc_id", "text").count())
    time("FULL again")(
      TextOps.minHashNearDupPairs(Tables.documents(spark, sfDir), "doc_id", "text").count())

    // ---- engine merge pipeline breakdown (mirrors EngineOps.runTwo) ----
    {
      import org.apache.hadoop.fs.Path
      implicit val s: SparkSession = spark
      val root = "/tmp/graft_profile_merge"
      val p = new Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val md = graft.metadata.Metadata.fromJson(s"""{
        "environment": { "name": "prof", "timezone": "UTC", "root_folder": "$root" },
        "connections": [ { "name": "c1" } ],
        "entities": [ { "id": 1, "name": "cust", "connection": "c1",
          "processtype": "merge",
          "settings": { "delete_missing": true },
          "columns": [
            { "name": "ID", "datatype": "long", "fieldroles": ["businesskey"] },
            { "name": "name", "datatype": "string" },
            { "name": "segment", "datatype": "string" } ] } ] }""")
      val e = md.getEntity(1)
      val bronze = md.bronzePath(e)
      val cust = Tables.customer(spark, sfDir)
      time("e: write slices") {
        cust.filter(col("c_custkey") % 3 =!= 0)
          .select(col("c_custkey").as("ID"), col("c_name").as("name"),
            col("c_mktsegment").as("segment"))
          .coalesce(1).write.mode("overwrite").parquet(s"$bronze/s1.parquet")
        cust.filter(col("c_custkey") % 2 === 0)
          .select(col("c_custkey").as("ID"), col("c_name").as("name"),
            col("c_mktsegment").as("segment"))
          .coalesce(1).write.mode("overwrite").parquet(s"$bronze/s2.parquet")
      }
      time("e: run1 (full divert)")(
        new graft.pipeline.Processing(md, e, "s1.parquet",
          Map("processing.time" -> "2024-01-10T10:00:00")).process())
      time("e: run2 (merge)")(
        new graft.pipeline.Processing(md, e, "s2.parquet",
          Map("processing.time" -> "2024-01-11T10:00:00")).process())
      time("e: read silver")(
        new graft.pipeline.Processing(md, e, "s2.parquet").table.read().count())
    }
    spark.stop()
  }
}
