package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Native DotProductExpr: differential equivalence with the HOF form,
  * null semantics, float/double input handling, and the SQL-name surface
  * registered through GraftExtensions.
  */
class DotProductSpec extends SparkSpec {

  import spark.implicits._

  test("native dot equals HOF dot bit-for-bit on random double arrays") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextDouble() * 2 - 1),
                             Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    assert(r.forall(x => x.getDouble(0) == x.getDouble(1))) // exact equality
  }

  test("native dot widens float arrays to double like the cast+HOF form") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(20)((Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(VectorOps.toDoubleArray(col("a")),
        VectorOps.toDoubleArray(col("b"))).as("hof")).collect()
    assert(r.forall(x => x.getDouble(0) == x.getDouble(1)))
  }

  test("null semantics: null array, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (None, Some(Seq(1.0))),                        // null array
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),         // length mismatch
    ).toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))

    val withNullElem = spark.sql(
      "SELECT array(1.0d, cast(null as double)) AS a, array(1.0d, 2.0d) AS b")
    assert(withNullElem.select(VectorOps.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("integer dot: exact long accumulation, null semantics, matches widened form") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextInt(255) - 127),
                             Seq.fill(64)(rnd.nextInt(255) - 127)))
    val df = rows.toDF("a", "b")
    val r = df.select(
      VectorOps.dotInt(col("a"), col("b")).as("int_dot"),
      VectorOps.dot(VectorOps.toDoubleArray(col("a")),
        VectorOps.toDoubleArray(col("b"))).cast("long").as("widened")).collect()
    assert(r.forall(x => x.getLong(0) == x.getLong(1)))

    val edge = Seq(
      (Some(Seq(127, -127)), Some(Seq(127, 127))),   // 0
      (None, Some(Seq(1))),                           // null array
      (Some(Seq(1, 2)), Some(Seq(1))),                // length mismatch
    ).toDF("a", "b")
    val e = edge.select(VectorOps.dotInt(col("a"), col("b"))).collect()
    assert(e(0).getLong(0) == 0L)
    assert(e(1).isNullAt(0))
    assert(e(2).isNullAt(0))
  }

  test("integer dot runs inside whole-stage codegen") {
    val df = spark.range(100)
      .select(
        array((0 to 7).map(i => (col("id") + i).cast("int")): _*).as("a"),
        array((0 to 7).map(i => (col("id") * i).cast("int")): _*).as("b"))
      .select(VectorOps.dotInt(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("vec_dot_int") && l.trim.startsWith("*")),
      s"vec_dot_int projection not codegen'd in:\n$plan")
    assert(df.agg(sum("d")).collect()(0).getLong(0) > 0L)
  }

  test("the expression runs inside whole-stage codegen") {
    // non-literal, HOF-free arrays: constant folding can't collapse the
    // plan, and nothing else in the projection breaks codegen.
    val df = spark.range(100)
      .select(
        array((0 to 7).map(i => (col("id") + i).cast("double")): _*).as("a"),
        array((0 to 7).map(i => (col("id") * i).cast("double")): _*).as("b"))
      .select(VectorOps.dot(col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // a starred operator is inside a WholeStageCodegen span
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.trim.startsWith("*")),
      s"vec_dot projection not codegen'd in:\n$plan")
    assert(df.agg(sum("d")).collect()(0).getDouble(0) > 0.0)
  }

  test("GraftExtensions registers vec_dot as a SQL function") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions: the config-string path ("spark.sql.extensions")
      // only applies when the SparkContext itself is created with it;
      // this test reuses the suite's context.
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(r == 11.0)
    } finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
