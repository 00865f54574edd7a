package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime;
  * explicit salting is the plan-level tool when one side has a few
  * pathological hot keys and the other side is small enough to
  * replicate per salt — e.g. joining a 100 TB event log against a user
  * dim where 0.1% of users produce 50% of events.
  *
  * Left side gets a random-ish but DETERMINISTIC salt (hash of the
  * whole row modulo `salts` — no Math.random, so retried tasks produce
  * identical output); the right side is exploded `salts` times. The
  * join key becomes (key, salt) so each hot key spreads over `salts`
  * reducers.
  */
object SkewJoin {

  /** Join types for which salting preserves semantics: the left side
    * carries ONE salt per row and the right side carries ALL salts per
    * row, so inner/left-outer/semi/anti rows match exactly iff they
    * match unsalted. right/full-outer are rejected — each of the
    * `salts` right-side copies that finds no left match would emit its
    * own null-padded row (salts-fold duplication of unmatched rights).
    */
  private val soundJoinTypes =
    Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(soundJoinTypes(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType" +
        " (right/full would duplicate unmatched right rows per salt)")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft
      .join(saltedRight, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
