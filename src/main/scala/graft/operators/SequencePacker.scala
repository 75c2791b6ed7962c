package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy sequence packing: assign documents to fixed-token-budget packs —
  * the standard pretraining step that concatenates short documents into
  * training sequences.
  *
  * Greedy reset-on-overflow is inherently sequential, so it runs
  * per-shard: documents are hash-sharded (deterministic `doc_id % shards`),
  * each shard is processed in doc_id order by a typed `flatMapGroups`
  * (one shuffle by shard; shard count scales with the cluster, each group
  * streams — no state beyond the open pack). Pack ids are globally unique
  * as (shard, pack_in_shard).
  */
object SequencePacker {

  /** Input: (doc_id, n_tokens) via the given columns. Output: doc_id,
    * shard, pack_id (unique), pack_seq (position within pack),
    * pack_tokens (running pack total including this doc). Documents larger
    * than maxTokens get a pack of their own. */
  def pack(
      docs: DataFrame,
      maxTokens: Int,
      shards: Int = 64,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val sharded = docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      col(tokensCol).cast(LongType).as("n_tokens"),
      pmod(col(idCol), lit(shards)).cast(IntegerType).as("shard"))

    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("shard", IntegerType),
      StructField("pack_id", LongType),
      StructField("pack_seq", IntegerType),
      StructField("pack_tokens", LongType)))

    sharded
      .as[(Long, Long, Int)](Encoders.tuple(
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaInt))
      .groupByKey(_._3)
      .flatMapGroups { (shard: Int, rows: Iterator[(Long, Long, Int)]) =>
        val sorted = rows.toArray.sortBy(_._1)
        var packInShard = 0L
        var used = 0L
        var seq = 0
        sorted.iterator.map { case (docId, nTok, _) =>
          if (used > 0 && used + nTok > maxTokens) {
            packInShard += 1; used = 0L; seq = 0
          }
          used += nTok
          seq += 1
          Row(docId, shard, shard.toLong * 1000000000L + packInShard,
            seq - 1, used)
        }
      }(Encoders.row(outSchema))
  }
}
