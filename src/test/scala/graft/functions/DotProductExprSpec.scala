package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class DotProductExprSpec extends SparkSpec {

  private def zipWithDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  test("native dot product is bit-identical to the zip_with+aggregate fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        VectorFns.dot(col("a"), col("b")).as("native"),
        zipWithDot(col("a"), col("b")).as("ref"))
      .collect()
    got.foreach { r =>
      // bitwise equality, not tolerance: same fold order, same promotions
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getInt(0)}")
    }
  }

  test("float x double (hyperplane) inputs and codegen path agree with eval") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)))
      .toDF("f", "d")
    val v = df.select(VectorFns.dot(col("f"), col("d"))).head().getDouble(0)
    assert(v === 1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0)
    // reversed argument order hits the swapped fd path
    val v2 = df.select(VectorFns.dot(col("d"), col("f"))).head().getDouble(0)
    assert(v2 === v)
  }

  test("type mismatch fails analysis with a clear message") {
    import spark.implicits._
    val df = Seq((Array(1, 2), Array(1.0f))).toDF("i", "f")
    val e = intercept[Exception] {
      df.select(VectorFns.dot(col("i"), col("f"))).collect()
    }
    assert(e.getMessage.contains("dot_product") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
