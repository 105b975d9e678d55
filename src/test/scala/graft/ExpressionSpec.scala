package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the interpreted lambda formulation bit-for-bit") {
    val df = Seq(
      (Seq(1.5f, -2.25f, 3.0f), Seq(0.5f, 4.0f, -1.25f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(-0.3f, 0.0f, 9.5f))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("lambda")).collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("graft_dot handles mixed float/double arrays (LSH planes)") {
    val df = Seq(Tuple1(Seq(1.0f, 2.0f, 3.0f))).toDF("v")
    val r = df.select(VectorFunctions.dot(col("v"),
      typedLit(Seq(2.0, -1.0, 0.5))).as("d")).head()
    assert(r.getDouble(0) == 1.0 * 2.0 - 2.0 + 3.0 * 0.5)
  }

  test("two non-nullable graft_dot instances coexist in one projection") {
    // non-nullable literal children make nullSafeCodeGen inline the
    // generated block UNBRACED — with fixed local names two instances
    // would collide in Janino and silently fall back to interpretation
    val df = spark.range(1)
    val r = df.select(
      VectorFunctions.dot(typedLit(Seq(1.0f, 2.0f)),
        typedLit(Seq(3.0, 4.0))).as("d1"),
      VectorFunctions.dot(typedLit(Seq(0.5f, 0.5f)),
        typedLit(Seq(2.0, 2.0))).as("d2")).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 2.0)
  }

  test("graft_dot rejects non-array inputs at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
  }
}
