package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exclusive running sums over a BOUNDED grouped table, without the
  * partition-less WindowExec stage.
  *
  * Every distributed prefix sum in the engine first reduces the
  * corpus-sized input to a bucket table of ~n/bucketWidth rows, then
  * needs running offsets over that table in bucket order. A
  * `Window.orderBy(...)` with no partition key computes that
  * correctly, but it funnels the table through ONE reducer stage and
  * logs a `WindowExec: No Partition Defined` warning per execution.
  * Because the bucket table is bounded by construction (its row count
  * is corpus/bucketWidth, or a fixed dimension), this instead uses the
  * recipe Spark itself uses inside `RDD.zipWithIndex`: bring the
  * bounded per-bucket sums to the driver, scan once, and ship the
  * offsets back as a literal DataFrame the caller broadcast-joins.
  * One bounded action replaces an exchange-to-one-partition + sort.
  */
object BoundedPrefix {

  /** For a `grouped` table with ONE ROW PER BUCKET, returns
    * `partCols ++ orderCols` plus, for each `(sumCol, offCol)` pair,
    * the EXCLUSIVE running sum of `sumCol` taken in `orderCols`
    * lexicographic order (nulls first, matching Spark's ascending
    * sort), restarting at every distinct `partCols` tuple. All sum
    * columns must be LongType (they are counts or token totals).
    */
  def offsets(grouped: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], sums: Seq[(String, String)]): DataFrame = {
    val keyCols = partCols ++ orderCols
    val proj = grouped.select((keyCols ++ sums.map(_._1)).map(grouped.col): _*)
    val rows = proj.collect()
    val nPart = partCols.length
    val nKey = keyCols.length

    def cmpVal(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _) => -1
      case (_, null) => 1
      case (x: String, y: String) => x.compareTo(y)
      case (x: java.lang.Number, y: java.lang.Number) =>
        java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
      case _ => sys.error(s"unsupported prefix key type: $a / $b")
    }
    val sorted = rows.sortWith { (r1, r2) =>
      var i = 0
      var c = 0
      while (i < nKey && c == 0) { c = cmpVal(r1.get(i), r2.get(i)); i += 1 }
      c < 0
    }

    val acc = Array.fill(sums.length)(0L)
    var prevPart: Seq[Any] = null
    val out = sorted.map { r =>
      val part = (0 until nPart).map(r.get)
      if (prevPart == null || part != prevPart) {
        java.util.Arrays.fill(acc, 0L)
        prevPart = part
      }
      val offs = acc.clone()
      var j = 0
      while (j < sums.length) { acc(j) += r.getLong(nKey + j); j += 1 }
      Row.fromSeq((0 until nKey).map(r.get) ++ offs)
    }

    val schema = StructType(
      keyCols.map(c => proj.schema(c)) ++
        sums.map { case (_, off) => StructField(off, LongType, nullable = false) })
    grouped.sparkSession.createDataFrame(out.toSeq.asJava, schema)
  }
}
