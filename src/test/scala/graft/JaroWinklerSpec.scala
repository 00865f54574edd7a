package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

/** Pins the Jaro-Winkler native expression: textbook values, the
  * DuckDB edge contract (either side empty scores 0.0), codegen ==
  * interpreted, and SQL registration.
  */
class JaroWinklerSpec extends SparkSpec {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values (the record-linkage literature's cases)") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("duane", "dwayne") - 0.8400000000000001) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // transposed pair outside the match window scores 0
    assert(jw("ab", "ba") == 0.0)
  }

  test("DuckDB edge contract: either side empty scores 0, even both") {
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("", "a") == 0.0)
  }

  test("winkler boost applies only above 0.7 and caps at 4 prefix chars") {
    // crate/trace: jaro 0.7333 > 0.7 but NO common prefix -> unboosted
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-15)
    // long shared prefix: boost uses at most 4 chars
    val j9 = jw("supplier", "suppliers")
    assert(math.abs(j9 - 0.9777777777777777) < 1e-15)
  }

  test("codegen and interpreted paths agree; SQL function registered") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("", ""), ("same", "same")).toDF("a", "b")
    val viaColumn = df.select(JaroWinkler.column(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    org.apache.spark.sql.graftx.GraftFunctions.register(spark)
    df.createOrReplaceTempView("jw_t")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_t")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaColumn == viaSql)
    assert(viaColumn == Seq(0.9611111111111111, 0.8133333333333332,
      0.0, 1.0))
  }
}
