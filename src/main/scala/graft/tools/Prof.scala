package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries("q_j3_semi")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n)")
    }
    time("warm")(spark.read.parquet(s"$d/lineitem.parquet").count())
    time("j3_semi run1")(fn(spark, d).count())
    time("j3_semi run2")(fn(spark, d).count())
    fn(spark, d).explain("formatted")
    spark.stop()
  }
}
