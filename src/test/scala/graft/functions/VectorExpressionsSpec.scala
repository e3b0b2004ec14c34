package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFunSuite with Matchers {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("graft_dot / graft_cosine are bit-identical to the HOF fold") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(50)(i =>
      (Array.tabulate(64)(j => (i * 64 + j) * 0.001 - 1.0),
        Array.tabulate(64)(j => 1.0 - (i + j) * 0.002)))
      .toDF("a", "b")

    val foldDot = aggregate(zip_with(col("a"), col("b"), _ * _),
      lit(0.0), (acc, x) => acc + x)
    def foldSq(c: String) = aggregate(zip_with(col(c), col(c), _ * _),
      lit(0.0), (acc, x) => acc + x)
    val foldCos = foldDot / sqrt(foldSq("a") * foldSq("b"))

    val rows = df.select(
      expr("graft_dot(a, b)").as("nd"),
      foldDot.as("fd"),
      expr("graft_cosine(a, b)").as("nc"),
      foldCos.as("fc")).collect()
    rows.foreach { r =>
      // exact bit equality, not approximate — same accumulation order
      r.getDouble(0) shouldBe r.getDouble(1)
      r.getDouble(2) shouldBe r.getDouble(3)
    }
  }

  test("zero-norm vectors yield null, never NaN; null elements propagate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS zn, " +
        "graft_dot(array(1.0D, CAST(null AS DOUBLE)), array(1.0D, 2.0D)) AS ne, " +
        "graft_cosine(array(1.0D, CAST(null AS DOUBLE)), array(1.0D, 2.0D)) AS nc")
      .head()
    r.isNullAt(0) shouldBe true // zero-norm: undefined, not NaN
    r.isNullAt(1) shouldBe true // null element: fold semantics
    r.isNullAt(2) shouldBe true
    // HOF reference implementation agrees
    import graft.ops.SimilarityOps
    val hof = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(SimilarityOps.cosine(col("a"), col("b")).as("c")).head()
    hof.isNullAt(0) shouldBe true
  }

  test("null inputs yield null; works in pure SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "graft_dot(CAST(null AS ARRAY<DOUBLE>), array(1.0D)) AS n").head()
    r.getDouble(0) shouldBe 1.0
    r.isNullAt(1) shouldBe true
  }

  test("expressions compile into whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-constant input, or constant folding evaluates at plan time
    val df = spark.range(5).select(
      expr("graft_dot(array(CAST(id AS DOUBLE), 2.0D), array(3.0D, 4.0D))").as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen span
    plan should include("*(1) Project [graft_dot")
    df.orderBy("d").head().getDouble(0) shouldBe 8.0 // id=0 → 0*3 + 2*4
  }

  test("session extensions install the functions for SQL users") {
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .appName("ext-test")
      .getOrCreate()
    // note: getOrCreate may return the existing session; register covers both
    GraftFunctions.register(s2)
    s2.sql("SELECT graft_dot(array(2.0D), array(3.0D))").head().getDouble(0) shouldBe 6.0
  }
}
