package graft

import org.apache.spark.sql.functions._

/** Plan-shape audits: these assert the SCALE properties SURVEY.md §4
  * promises — pushdown reaching the parquet scan, no cartesian products,
  * bounded shuffle counts — so a regression in plan quality fails CI, not
  * just a benchmark eyeball.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("upsert merge plan: no cartesian, filters pushed to parquet scan") {
    val p = plan("upsert_basic")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters"), "expected parquet pushdown info")
    // The %3/%7 row filters must reach the scans as data filters, not
    // post-scan filters only.
    assert(p.contains("FileScan parquet"))
  }

  test("upsert merge is a single join (one shuffle pair or broadcast)") {
    val p = plan("upsert_basic")
    val joins = countOccurrences(p, "Join")
    assert(joins >= 1 && joins <= 2, s"unexpected join count in:\n$p")
  }

  test("parser queries stay inside whole-stage codegen") {
    val p = plan("parse_amounts")
    // "*(n)" node prefixes mark WholeStageCodegen spans in treeString.
    assert(p.contains("*(1)"), s"no codegen span:\n$p")
    assert(!p.contains("Exchange"), "parser projection must not shuffle")
  }

  test("column pruning: parser query reads only c_custkey") {
    val p = plan("parse_ints")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint>"),
      s"expected pruned schema in:\n$p")
  }

  test("dedup and ANN plans are equi-joins, never cartesian") {
    Seq("dedup_minhash", "dedup_simhash", "ann_lsh").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q plan has cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin") || q == "ann_brute",
        s"$q plan has nested-loop join:\n$p")
    }
  }

  test("sessionize is exactly one shuffle (window by user)") {
    val p = plan("sessionize")
    // one Exchange for the user_id window; the final agg reuses it
    val exchanges = countOccurrences(p, "Exchange hashpartitioning")
    assert(exchanges <= 2, s"too many shuffles:\n$p")
  }

  test("flagship entry() runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
