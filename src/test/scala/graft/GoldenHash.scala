package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/** Canonical output hashing for the `no_oracle` registered queries —
  * the driver's check for these is rows-only, so a silent behavior
  * change (the round-2 minShared incident) would sail through without
  * this pin. Canonical form: columns sorted by name, every value
  * rendered deterministically (binary as hex, arrays/structs
  * recursively, timestamps as instants), rows sorted as strings, md5
  * over the lot — partition order and shuffle nondeterminism cannot
  * leak into the hash, while any VALUE change flips it.
  */
object GoldenHash {

  def canon(v: Any): String = v match {
    case null => "␀"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case a: Array[_] => a.map(canon).mkString("[", ",", "]")
    case a: Seq[_] => a.map(canon).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.toSeq.map { case (k, x) => canon(k) + "->" + canon(x) }
        .sorted.mkString("{", ",", "}")
    case r: Row => r.toSeq.map(canon).mkString("(", ",", ")")
    case t: java.sql.Timestamp => t.toInstant.toString
    case x => x.toString
  }

  def of(spark: org.apache.spark.sql.SparkSession, name: String,
      sfDir: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect().map(canon).sorted
    val md = MessageDigest.getInstance("MD5")
    md.update(cols.mkString("|").getBytes("UTF-8"))
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Every registered query whose driver check is rows-only (no oracle
    * SQL) — kept in sync by the completeness test in GoldenHashSpec.
    */
  def noOracleQueries: Seq[String] =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
}

/** Re-pin tool: `sbt 'Test/runMain graft.GoldenHashGen [sfDir]'`
  * prints the expected-hash map literal for GoldenHashSpec at the
  * given scale factor (default sf0.001; pass /root/testdata/sf0.01
  * for the second pin table). Re-pin ONLY after explaining why an
  * output legitimately changed.
  */
object GoldenHashGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    GoldenHash.noOracleQueries.foreach { n =>
      println(s"""    "$n" -> "${GoldenHash.of(spark, n, sfDir)}",""")
    }
    spark.stop()
  }
}
