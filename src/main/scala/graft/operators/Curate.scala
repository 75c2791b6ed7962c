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
      text: Column = col("text"),
      maxDupLineFrac: Double = 1.0): DataFrame = {
    // quality and language both derive from ONE TextStats walk, computed
    // in its own projection so the expression runs once per row; the
    // combined gate is a single filter over the struct fields. The
    // repetition gate (off at the 1.0 default) adds the one-pass
    // RepetitionStats kernel to the same filter.
    val B = org.apache.spark.sql.graft.Bridge
    val repGate: Column =
      if (maxDupLineFrac >= 1.0) lit(true)
      else B.column(RepetitionStats(B.expression(col("_text"))))
        .getField("dup_line_frac") <= maxDupLineFrac
    val kept = docs
      .select(col("doc_id"), text.as("_text"),
        TextAnalysis.stats(text).as("_st"))
      .withColumn("quality_score",
        TextAnalysis.qualityScoreFrom(col("_st")))
      .filter(col("quality_score") >= minQuality &&
        TextAnalysis.langIdFrom(col("_st")).isInCollection(langs) &&
        repGate)
      .select(col("doc_id"),
        TextAnalysis.redact(col("_text")).as("clean_text"),
        col("quality_score"))
    // exact dedup on the REDACTED text: smallest doc_id survives
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("clean_text"))).orderBy(col("doc_id"))
    kept
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Benchmark decontamination — the GPT-3/Pile-style step: drop every
    * corpus document sharing ANY word n-gram with the evaluation set, so
    * test data never leaks into training data.
    *
    * Scale shape: the benchmark side (test sets — MBs, not TBs) explodes
    * to a DISTINCT n-gram relation and BROADCASTS; the corpus side is one
    * scan + shingle explode feeding a map-side hash semi-join — the
    * corpus is never shuffled to find contamination, only the (typically
    * tiny) contaminated-id set flows into the anti-join. At extreme
    * benchmark sizes swap the broadcast for a bloom-filter prefilter plus
    * exact verify on the candidates.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      text: Column = col("text")): DataFrame = {
    val bGrams = benchmark
      .select(explode(Dedup.shingles(text, n)).as("_g"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol), explode(Dedup.shingles(text, n)).as("_g"))
      .join(broadcast(bGrams), "_g")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered decontamination — the scale path when the
    * benchmark's distinct n-gram set outgrows a comfortable broadcast
    * JOIN table: a driver-built Bloom filter over the benchmark grams
    * (bits ≈ 1.2 GB per 10⁹ grams at 1% fpp — an order of magnitude
    * smaller than the gram strings) rides the task closure as a
    * literal-embedded [[BloomMightContain]], so the corpus scan drops
    * clean grams with zero join and zero shuffle; only the surviving
    * CANDIDATE grams (true overlaps + fpp·|corpus grams| false
    * positives) enter the exact-verify join, which AQE sizes freely
    * because its corpus side is now tiny. False positives cannot leak:
    * the verify join is exact, so the result EQUALS [[decontaminate]]
    * at any fpp — only the prefilter selectivity changes. */
  def decontaminateBloom(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      idCol: String = "doc_id",
      text: Column = col("text"),
      fpp: Double = 0.01): DataFrame = {
    val B = org.apache.spark.sql.graft.Bridge
    val bGrams = benchmark
      .select(explode(Dedup.shingles(text, n)).as("_g"))
      .distinct()
    // The distinct-gram build feeds two ACTIONS here (count sizes the
    // filter honestly, then the bloom aggregation) and later the
    // exact-verify join: persist through the actions so the benchmark
    // shingles once, then release — the verify join re-derives it one
    // time inside the caller's plan (2 evaluations total, not 3).
    bGrams.persist()
    val bytes =
      try {
        val expected = math.max(bGrams.count(), 1L)
        val bf = bGrams.stat.bloomFilter("_g", expected, fpp)
        val out = new java.io.ByteArrayOutputStream()
        bf.writeTo(out)
        out.toByteArray
      } finally bGrams.unpersist()
    val candidates = corpus
      .select(col(idCol), explode(Dedup.shingles(text, n)).as("_g"))
      .filter(B.column(
        BloomMightContain(B.expression(col("_g")), bytes)))
    val contaminated = candidates.join(bGrams, "_g")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Ratio variant: drops a document only when MORE than `maxOverlap` of
    * its distinct n-grams appear in the benchmark (some pipelines
    * tolerate incidental short overlaps; `maxOverlap = 0.0` reproduces
    * the strict any-overlap rule). Same broadcast shape — the per-doc
    * distinct-gram and overlap counts come from one aggregation over the
    * exploded grams with the broadcast membership flag. */
  def decontaminateRatio(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 8,
      maxOverlap: Double = 0.1,
      idCol: String = "doc_id",
      text: Column = col("text")): DataFrame = {
    val bGrams = benchmark
      .select(explode(Dedup.shingles(text, n)).as("_g"))
      .distinct()
      .withColumn("_hit", lit(1))
    val ratios = corpus
      .select(col(idCol), explode(Dedup.shingles(text, n)).as("_g"))
      .distinct() // per-doc DISTINCT grams, so the ratio is set-based
      .join(broadcast(bGrams), Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("_hit"), lit(0))) /
        count(lit(1))).as("_overlap"))
    val contaminated = ratios.filter(col("_overlap") > maxOverlap)
      .select(idCol)
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Cross-document LINE-level exact deduplication (the CCNet/RefinedWeb
    * shape): every distinct non-blank line in the corpus keeps only its
    * FIRST occurrence — smallest (document, position) — every later copy
    * is removed, and documents are reassembled from their surviving
    * lines (a document losing every line drops out). This strips shared
    * boilerplate (headers, footers, nav chrome) that document-level
    * dedup can't see.
    *
    * Scale shape: the dedup aggregate exchanges (line-hash,
    * occurrence-key) — 16 bytes per line, never the text — with map-side
    * partial min; winners flow back through a semi-join keyed on the
    * same hash, and reassembly is one shuffle on the document id. A
    * row_number window over raw lines would sort-shuffle the full text
    * instead. The 64-bit xxhash64 key can in principle collide (p ≈
    * n²/2⁶⁵ — two colliding lines would dedup as one); the DuckDB
    * oracle checks the result by true line equality. Positions are
    * packed as `doc_id * 1e6 + pos` (documents are assumed under 1M
    * lines). */
  def dedupLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val occ = docs
      .select(col(idCol), posexplode(split(col(textCol), "\n")))
      .toDF(idCol, "_pos", "_line")
      .filter(trim(col("_line")) =!= "")
      .withColumn("_okey",
        col(idCol).cast("long") * 1000000L + col("_pos"))
      .withColumn("_lh", xxhash64(col("_line")))
    val first = occ.groupBy(col("_lh").as("_flh"))
      .agg(min(col("_okey")).as("_fokey"))
    occ.join(first,
        col("_lh") === col("_flh") && col("_okey") === col("_fokey"),
        "left_semi")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line")),
        "\n").as(textCol))
  }

  /** EXACT-SUBSTRING dedup (the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" mode, window-approximated): any
    * `k`-token window whose normalized text occurs more than once in the
    * corpus — across documents OR within one — survives only at its
    * FIRST occurrence (minimum packed (doc, pos)); every other
    * occurrence's token span is cut, and overlapping duplicate windows
    * merge naturally because cutting works per token position. A
    * duplicated passage LONGER than k is covered by its overlapping
    * windows, so the whole passage disappears from non-canonical docs
    * while single shared phrases shorter than k are left alone.
    *
    * Operates in NORMALIZED token space (lowercase, punctuation
    * collapsed — the same normalization the near-dup family uses), which
    * is the standard working representation for training-data dedup; the
    * output text is the surviving normalized tokens. Docs cut to nothing
    * are dropped (same contract as [[dedupLines]]).
    *
    * Scale shape: the duplicate-window exchange carries ONLY
    * (xxhash64(window), packed position) with a map-side partial min —
    * the text never shuffles to find duplicates; cut positions flow back
    * as (doc, pos) ints and the rebuild is one aggregate-free projection
    * over a semi-joined slim frame. Same packing assumption as
    * [[dedupLines]] (documents under 1M tokens); the 64-bit hash's
    * collision risk is the oracle's to check (it compares by true window
    * text). */
  def dedupSubstrings(
      docs: DataFrame,
      k: Int = 20,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"window must be positive, got $k")
    // one split per doc, bound to a column so the window transform
    // references the attribute instead of re-evaluating the split
    val toks = docs.select(col(idCol),
      filter(split(lower(regexp_replace(col(textCol),
        "[^a-z0-9]+", " ")), " "), t => t =!= "").as("_t"))
      .filter(size(col("_t")) > 0)
    // k-gram windows with start positions; short docs fall back to one
    // whole-doc window (the shingle convention — equal short docs dedup)
    val wins = toks.select(col(idCol), col("_t"),
      posexplode(
        when(size(col("_t")) < k, array(array_join(col("_t"), " ")))
          .otherwise(transform(
            sequence(lit(0), size(col("_t")) - k),
            st => array_join(slice(col("_t"), st + 1, lit(k)), " ")))))
      .select(col(idCol), col("pos"),
        xxhash64(col("col")).as("_wh"),
        (col(idCol).cast("long") * 1000000L + col("pos")).as("_okey"))
    // slim exchange: (window hash) -> (count, first packed occurrence)
    val firsts = wins.groupBy(col("_wh").as("_fwh"))
      .agg(count(lit(1)).as("_n"), min(col("_okey")).as("_fokey"))
    // cut SPANS per doc (start-sorted), not exploded positions: the
    // aggregate exchanges one struct per duplicated window instead of k
    // rows per window, and the rebuild below walks tokens+spans once —
    // the per-token array_contains HOF this replaces rescanned the cut
    // set for every token: quadratic on a long mostly-duplicated doc
    // (the boilerplate-heavy case this operator exists for).
    val cuts = wins
      .join(firsts, col("_wh") === col("_fwh") && col("_n") > 1 &&
        col("_okey") =!= col("_fokey"), "inner")
      .select(col(idCol),
        struct(col("pos").as("s"), (col("pos") + lit(k - 1)).as("e"))
          .as("_span"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("_span"))).as("_spans"))
    val B = org.apache.spark.sql.graft.Bridge
    val emptySpans = array().cast("array<struct<s:int,e:int>>")
    toks.join(cuts, Seq(idCol), "left")
      .select(col(idCol),
        B.column(DropSpans(
          B.expression(col("_t")),
          B.expression(coalesce(col("_spans"), emptySpans))))
          .as(textCol))
      .filter(col(textCol) =!= "")
  }

  /** Deterministic mixture sampling to a size budget — drawing a
    * training mix: each source gets `weight(source) × budget` units
    * (tokens, chars, bytes — whatever `sizeCol` counts), filled by its
    * documents in md5-hash order, so the sample is reproducible in any
    * engine and independent of partitioning, row order, and cluster
    * size (same discipline as [[hashSplit]]). A document is kept while
    * the running size within its source stays inside the cap; sources
    * absent from `weights` contribute nothing.
    *
    * Output: the kept rows plus a `cum_size` column (the running size
    * at which each document entered its source's budget — the draw's
    * audit trail).
    *
    * Scale shape: one hash-partitioned sort per source for the running
    * sum's window — over a SLIM (id, source, size) frame only, never the
    * document content: the draw is decided on ids + sizes, then content
    * joins back by id (an exchange AQE turns into a broadcast when the
    * kept set is small; either way the text crosses the wire at most
    * once, instead of riding a per-source sort). Unweighted sources are
    * FILTERED OUT before the exchange (they can't contribute, so they
    * must not be sorted, and a zero-size document from one must not slip
    * past a zero cap). Parallelism of the draw is bounded by the number
    * of sources; with a handful of huge sources prefer
    * [[hashSplit]]-style fraction cuts (no sort) when an approximate
    * budget suffices. */
  def mixtureSample(
      docs: DataFrame,
      weights: Map[String, Double],
      budget: Long,
      idCol: String = "doc_id",
      sourceCol: String = "source",
      sizeCol: String = "n_chars",
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "mixtureSample needs at least one weight")
    val cap = weights.foldLeft(lit(0.0)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(w * budget)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(salt))),
        col(idCol))
    val kept = docs
      .filter(col(sourceCol).isInCollection(weights.keys.toSeq))
      .select(col(idCol), col(sourceCol), col(sizeCol))
      .withColumn("cum_size", sum(col(sizeCol)).over(w))
      .filter(col("cum_size") <= cap)
      .select(col(idCol), col("cum_size"))
    docs.join(kept, Seq(idCol))
  }

  /** Per-key document cap — the web-corpus staple "at most N pages per
    * domain / per source", keeping the best ones: rows rank within their
    * key by `orderBy` descending (ties broken by id ascending, so the
    * result is deterministic and engine-reproducible) and ranks > n are
    * dropped. Same scale shape as [[mixtureSample]]: the ranking window
    * sees only the SLIM (id, key, order) projection — content joins back
    * by id after the cut, so the text never rides the per-key sort.
    * Parallelism of the ranking is bounded by key cardinality (domains:
    * millions — fine; a single hot key degenerates to one sorted
    * partition of ids, never of content). */
  def capPerKey(
      docs: DataFrame,
      n: Int,
      keyCol: String = "source",
      orderCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(orderCol).desc, col(idCol))
    val kept = docs
      .select(col(idCol), col(keyCol), col(orderCol))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= n)
      .select(col(idCol), col("_rank").as("rank"))
    docs.join(kept, Seq(idCol))
  }

  /** Deterministic hash split — how large pipelines take reproducible
    * train/validation/test cuts and downsamples: a row's fate depends
    * only on (id, salt), never on partitioning, row order, or cluster
    * size, so the same split falls out on any rerun anywhere. The hash
    * is md5 (not Spark's murmur3) so any engine — including the DuckDB
    * oracle — reproduces the assignment bit-for-bit. Zero shuffle: a
    * pure filter the optimizer pushes to the scan.
    *
    * Returns rows whose bucket lands in [lo, hi): e.g. train =
    * split(df, 0.0, 0.9), validation = split(df, 0.9, 1.0) — disjoint
    * and exhaustive by construction. */
  def hashSplit(
      df: DataFrame,
      lo: Double,
      hi: Double,
      idCol: String = "doc_id",
      salt: String = ""): DataFrame = {
    // first 8 hex chars of md5(id || salt) are uniform in [0, 2^32);
    // fixed-length lowercase hex compares lexicographically AS the
    // number, so the cut is two string comparisons — no hex parsing,
    // byte-identical in any engine.
    // "g" sorts after every hex digit, so hi=1.0 includes "ffffffff"
    def hex(f: Double): String =
      if (f >= 1.0) "g"
      else f"${(math.max(f, 0.0) * 4294967296.0).toLong}%08x"
    val u = substring(md5(concat(col(idCol).cast("string"), lit(salt))), 1, 8)
    df.filter(u >= lit(hex(lo)) && u < lit(hex(hi)))
  }
}
