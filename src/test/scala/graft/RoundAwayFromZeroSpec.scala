package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.RoundAwayFromZero

/** The native fixed-scale rounding that replaced Spark's
  * BigDecimal-backed round() in the ANN sim paths: half away from zero
  * on the scaled double — DuckDB's round(DOUBLE, n) arithmetic — with
  * -0.0 normalized to +0.0 (the value the previously-green oracles
  * pinned from the BigDecimal path).
  */
class RoundAwayFromZeroSpec extends SparkSpec {

  import spark.implicits._

  private def r6(xs: Seq[java.lang.Double]): Seq[java.lang.Double] =
    xs.toDF("x")
      .select(RoundAwayFromZero.column(col("x"), 6).as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else
        java.lang.Double.valueOf(r.getDouble(0))).toSeq

  test("half rounds away from zero at the 6th decimal, both signs") {
    val got = r6(Seq(2.5e-6, 3.5e-6, -2.5e-6, -3.5e-6,
      0.1234565, -0.1234565, 1.4999999999999998e-6))
    assert(got == Seq(3e-6, 4e-6, -3e-6, -4e-6,
      0.123457, -0.123457, 1e-6))
  }

  test("values already at 6 decimals and exact halves pass through") {
    val got = r6(Seq(0.123456, -0.123456, 1.0, -1.0, 0.0))
    assert(got == Seq(0.123456, -0.123456, 1.0, -1.0, 0.0))
  }

  test("negative tiny values round to +0.0, never -0.0") {
    val got = r6(Seq(-2e-7, -4.9e-7))
    got.foreach { v =>
      assert(v.doubleValue == 0.0 &&
        java.lang.Double.doubleToRawLongBits(v.doubleValue) == 0L,
        s"got bits ${java.lang.Double.doubleToRawLongBits(v.doubleValue)}")
    }
  }

  test("null propagates; NaN stays NaN") {
    assert(r6(Seq(null)) == Seq(null))
    assert(r6(Seq(java.lang.Double.valueOf(Double.NaN)))
      .head.doubleValue.isNaN)
  }

  test("interpreted eval agrees with codegen on a random sweep") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 2 - 1) ++
      Seq.fill(500)((rnd.nextInt(2000001) - 1000000) / 2e6)
    val expr = RoundAwayFromZero(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.DoubleType, nullable = false), 6)
    val viaCodegen = xs.toDF("x")
      .select(RoundAwayFromZero.column(col("x"), 6)).collect()
      .map(_.getDouble(0))
    val viaInterp = xs.map(x =>
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(x))
        .asInstanceOf[Double])
    assert(viaCodegen.toSeq == viaInterp,
      "codegen and interpreted paths disagree")
  }

  test("agrees with Spark's round() across the sim value range") {
    // the two definitions coincide except on decimal-vs-binary
    // boundary artifacts no real sim hits; a broad random sweep
    // finding zero disagreements pins that the swap is value-neutral
    // on realistic data (the DuckDB oracles are the binding contract,
    // re-proven by the full verify run)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(20000)(rnd.nextDouble() * 2 - 1)
    val both = xs.toDF("x").select(
      RoundAwayFromZero.column(col("x"), 6).as("a"),
      round(col("x"), 6).as("b"))
      .where(col("a") =!= col("b"))
    assert(both.count() == 0, s"disagreements: ${both.head(5).toSeq}")
  }
}
