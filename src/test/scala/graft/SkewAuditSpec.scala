package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.mapping.Mapping
import graft.operators.{Dedup, Upsert}
import graft.sources.Sources

/** Adversarial-skew audit at a scale the sf0.1 driver data can't reach:
  * one key owning 10% of a million-row source, and a single degenerate
  * LSH bucket holding 50k rows. The claims under test are the two §4
  * scale arguments: (1) the upsert's intra-source dedup is a HASH
  * AGGREGATE with map-side partials, so a hot key collapses to one row
  * per map partition before the exchange and the post-dedup join keys
  * are unique — skew never reaches the join; (2) `capBuckets` bounds
  * within-bucket pair blow-up, the one skew mode AQE cannot fix.
  */
class SkewAuditSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("price", DoubleType)))

  test("hot key (10% of 1M rows) is absorbed by map-side partial agg") {
    val n = 1000000L
    val src = spark.range(n).select(
      when(col("id") % 10 === 0, lit(42L)).otherwise(col("id")).as("k"),
      (col("id") % 1000).cast(DoubleType).as("v"),
      col("id").as("ord"))
    val source = Sources.fromColumns(src, Seq(col("k"), col("v")),
      order = col("ord"))
    val target = spark.range(0, n, 3).select(
      col("id"), lit(-1.0).as("price"))
    val m = new Mapping()
    m.auto("id"); m.auto("price")
    val projected = m.complete(schema).project(source)
    val res = Upsert(target, projected, m)

    // Plan: the dedup is a two-phase hash aggregate — partial min_by/
    // max_by BEFORE the exchange — and never a window sort over the raw
    // duplicated rows.
    val plan = res.merged.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_min_by"),
      s"no map-side partial aggregation in merge plan:\n${plan.take(4000)}")
    assert(!plan.contains("Window"),
      s"window dedup would sort-shuffle every hot-key row:\n${plan.take(4000)}")

    // Correctness under the pile-up: key 42 holds ALL id%10==0 rows;
    // last duplicate (ord = n-10) wins.
    val hot = res.merged.filter(col("id") === 42L).collect()
    assert(hot.length == 1, s"hot key must collapse to one row: ${hot.toSeq}")
    assert(hot.head.getDouble(1) == ((n - 10) % 1000).toDouble,
      s"last-dup-wins violated for the hot key: ${hot.head}")

    val total = res.merged.count()
    // target rows (n/3 ids ≡ 0 mod 3) ∪ source keys (42 + all id%10!=0)
    val expected = spark.range(0, n, 3).select(col("id"))
      .union(src.select(col("k").as("id"))).distinct().count()
    assert(total == expected, s"merged=$total expected=$expected")
  }

  test("degenerate 50k-row LSH bucket is capped, never quadratic") {
    // 50k rows land in ONE (band, bh) bucket; uncapped that is 1.25e9
    // candidate pairs. With the cap the bucket is pruned wholesale while
    // a planted pair in a healthy bucket survives.
    val hot = spark.range(50000L).select(
      col("id").as("doc_id"), lit(0).as("band"), lit(777L).as("bh"))
    val planted = Seq((9000001L, 1, 123L), (9000002L, 1, 123L))
      .toDF("doc_id", "band", "bh")
    val banded = hot.union(planted.select(col("doc_id"), col("band"), col("bh")))
    val capped = Dedup.capBuckets(banded, Seq("band", "bh"), 100)
    assert(capped.filter(col("bh") === 777L).count() == 0,
      "hot bucket must be pruned wholesale")
    assert(capped.filter(col("bh") === 123L).count() == 2,
      "healthy bucket must survive the cap")
    // The cap bounds candidate pairs to cap²/2 per bucket by construction:
    // the self-join of the capped relation can never see the hot bucket.
    val a = capped.alias("a"); val b = capped.alias("b")
    val pairs = a.join(b,
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") > col("b.doc_id")).count()
    assert(pairs == 1L, s"expected only the planted pair, got $pairs")
  }

  test("line shared by EVERY doc (200k docs) stays linear in dedupLines") {
    // the boilerplate-header case IS the hot key: one line value occurs
    // once per document. The dedup aggregate collapses it map-side to
    // one (hash, min) partial per partition, and the semi-join keeps
    // only the single winning occurrence — no row ever multiplies.
    val n = 200000L
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("SHARED HOT LINE\nuniq-"), col("id").cast("string"))
        .as("text"))
    val out = graft.operators.Curate.dedupLines(docs)
    val rows = out.count()
    assert(rows == n, s"every doc keeps its unique line: $rows != $n")
    // exactly ONE doc keeps the hot line
    val withHot = out.filter(col("text").contains("SHARED HOT LINE"))
      .collect()
    assert(withHot.length == 1 && withHot(0).getLong(0) == 0L,
      s"hot line must survive exactly once, in doc 0: ${withHot.toSeq}")
    // and the winner aggregate output is ONE row for the hot hash —
    // distinct line count bounds the build side, not occurrence count
    val totalLines = out.select(
      explode(split(col("text"), "\n"))).count()
    assert(totalLines == n + 1,
      s"surviving lines must be n uniques + 1 hot: $totalLines")
  }
}
