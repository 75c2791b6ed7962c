package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pipeline:
  *
  *  1. quality gate (Gopher-style rule score),
  *  2. language filter,
  *  3. PII-style redaction,
  *  4. exact dedup (keep the smallest doc_id per content hash).
  *
  * One scan, one aggregate-free projection chain, one hash shuffle for the
  * dedup window — the shape this keeps at 100 TB. Near-dup removal
  * (minhashLsh + canonicalizeFixpoint) composes on top when needed.
  */
object Curate {

  def apply(
      docs: DataFrame,
      minQuality: Double = 0.6,
      langs: Seq[String] = Seq("en"),
      text: Column = col("text")): DataFrame = {
    // quality and language are plain Columns → single scan, no self-join
    val kept = docs
      .withColumn("quality_score", TextAnalysis.qualityScore(text))
      .filter(col("quality_score") >= minQuality)
      .filter(TextAnalysis.langId(text).isInCollection(langs))
      .select(col("doc_id"),
        TextAnalysis.redact(text).as("clean_text"),
        col("quality_score"))
    // exact dedup on the REDACTED text: smallest doc_id survives
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("clean_text"))).orderBy(col("doc_id"))
    kept
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
