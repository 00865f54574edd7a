package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row matched to the LATEST right row with
  * right.ts <= left.ts on the same key (inner semantics — unmatched
  * left rows drop).
  *
  * Spark has no asof operator; the naive encoding
  * (range join + per-left max) explodes to every (left, earlier-right)
  * pair before pruning. This implementation is the single-shuffle
  * composition: tag both sides, union, and carry the last non-null
  * right payload forward with an ignoreNulls window — each row is
  * shuffled exactly once on the key, state per partition is one
  * payload struct, and the sort is the one the window needs anyway.
  * (Preference (a) of SURVEY §2.2's custom-operator ladder: composition
  * beats a custom SparkPlan here because the plan is already optimal.)
  *
  * Tie rule: a right row at exactly left.ts matches (>= semantics,
  * right sorts before left at equal ts) — same as DuckDB's ASOF JOIN,
  * which the oracle uses.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val tagged =
      left.select(
        col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(1).as("_side"), lit(null).cast(rType).as("_r"),
        lStruct.as("_l"))
      .unionByName(right.select(
        col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(0).as("_side"), rStruct.as("_r"),
        lit(null).cast(lType).as("_l")))

    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    tagged
      .withColumn("_m", last("_r", ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_m").isNotNull)
      .select(col("_l").as("left"), col("_m").as("right"))
  }

  /** Forward as-of: each left row matched to the EARLIEST right row
    * with right.ts >= left.ts on the same key (inner semantics). Same
    * single-shuffle union+window shape, mirrored: the frame looks
    * forward and takes the first non-null right payload. Tie rule: a
    * right row at exactly left.ts matches (right sorts after left at
    * equal ts) — same as DuckDB's `ASOF JOIN ... ON l.ts <= r.ts`.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val tagged =
      left.select(
        col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(1).as("_side"), lit(null).cast(rType).as("_r"),
        lStruct.as("_l"))
      .unionByName(right.select(
        col(keyCol).as("_k"), col(tsCol).as("_ts"),
        lit(0).as("_side"), rStruct.as("_r"),
        lit(null).cast(lType).as("_l")))

    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    tagged
      .withColumn("_m", first("_r", ignoreNulls = true).over(w))
      .where(col("_side") === 1 && col("_m").isNotNull)
      .select(col("_l").as("left"), col("_m").as("right"))
  }
}
