package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-layout helpers: pre-shuffle a table ONCE at write time so every
  * subsequent join/aggregation on the bucket key is shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every import run and reading co-located buckets: the upsert target
  * should live as a bucketed table on its key, making the full-outer merge
  * join a zero-exchange sort-merge against the (much smaller) source.
  */
object Bucketing {

  /** Write `df` as a bucketed + sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
