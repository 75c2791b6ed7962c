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

  test("star join broadcasts dimensions, never cartesian") {
    val p = plan("revenue_by_region")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"cartesian in star join:\n$p")
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2,
      s"nation/region dims must broadcast:\n$p")
  }

  test("decontamination joins broadcast the benchmark grams") {
    val p = plan("decontaminate")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark gram join must broadcast:\n$p")
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

  test("upsert merge has no window and compiles without codegen fallback") {
    // Round-3 invariants: intra-source dup collapse is a hash/sort
    // AGGREGATE with map-side partials (no row_number window), and the
    // whole merge stage stays in whole-stage codegen (the ElementAt/
    // CreateArray Janino bug is designed out — see SURVEY §4).
    val df = SparkEntry.queries("upsert_basic")(spark, dir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window dedup crept back:\n$p")
    // `*(n)` prefixes mark whole-stage-codegen spans; the merge
    // project/filter/join stage must carry one.
    assert(p.contains("*(5) Project") || p.contains("*(4) Project")
      || p.contains("*(3) Project"),
      s"merge stage not codegen'd:\n$p")
    assert(p.contains("partial_max_by"),
      s"dup collapse lost its map-side partial aggregation:\n$p")
  }

  test("ANN top-k plans rank through the bounded aggregate") {
    Seq("ann_brute", "ann_lsh", "ann_multiprobe").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q ranks via window funnel:\n$p")
      assert(p.contains("topk_by_score"), s"$q lacks bounded agg:\n$p")
    }
  }

  test("csv source is one scan with no RDD boundary") {
    val p = plan("csv_source")
    assert(!p.contains("ExistingRDD"), s"RDD boundary in csv plan:\n$p")
    assert(countOccurrences(p, "FileScan text") == 1,
      s"expected exactly one text scan:\n$p")
  }

  test("flagship entry() runs and returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
