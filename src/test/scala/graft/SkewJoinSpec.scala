package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of rows share one hot key.
    val big = spark.range(1000).select(
      when($"id" < 900, 7L).otherwise($"id" % 50).as("k"),
      $"id".as("payload"))
    val small = Seq((7L, "hot"), (3L, "cold"), (11L, "mild"))
      .toDF("k", "label")
    val plain = big.join(small, "k")
    val salted = SkewJoin.salted(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    val a = plain.orderBy("payload").collect().map(_.toSeq).toSeq
    val b = salted.select(plain.columns.map(col): _*)
      .orderBy("payload").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("salted join spreads the hot key over saltFactor sub-keys") {
    val big = spark.range(100).select(lit(7L).as("k"), $"id".as("payload"))
    val small = Seq((7L, "hot")).toDF("k", "label")
    // the join keys are (k, _salt): count distinct salts actually used
    val salts = big.withColumn("_salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .select(countDistinct("_salt")).head.getLong(0)
    assert(salts > 1, "salt must spread the hot key")
    assert(SkewJoin.salted(big, small, "k", 8).count() == 100)
  }
}
