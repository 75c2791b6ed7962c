package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When a handful of hot keys dominate a join (the classic 100 TB failure
  * mode AQE's skew handling doesn't always catch — e.g. a subsequent
  * aggregation keyed on the same column), salting spreads each hot key
  * over `saltFactor` artificial sub-keys: the big side gets a
  * deterministic per-row salt, the small side is replicated `saltFactor`×,
  * and the join key becomes (key, salt). Result is identical to the plain
  * join; the shuffle partitions are `saltFactor`× finer-grained on hot
  * keys.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted. The salt is
    * derived from a hash of the big side's whole row (deterministic, no
    * rand()), so the plan stays replayable/resumable. */
  def salted(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    val bigCols = big.columns
    val bigSalted = big.withColumn(
      "_salt",
      pmod(xxhash64(bigCols.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val smallReplicated = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted
      .join(smallReplicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
