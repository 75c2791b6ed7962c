package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level link graph + PageRank — the crawl-prioritization layer on
  * top of [[LinkExtract]] (outlinks), [[UrlOps]] (registered domains)
  * and the frontier/politeness kernels. Production pipelines rank hosts
  * (not pages) to budget crawl and to weight quality priors
  * (Common Crawl publishes exactly this artifact); the page-level graph
  * is the same operator with a finer node key.
  *
  * EXACT-ARITHMETIC PageRank: ranks are BIGINT fixed-point micro-units
  * and every step is integer multiply/divide — no floating point
  * anywhere — so two engines (or two cluster topologies) replay
  * BIT-IDENTICAL ranks regardless of aggregation order. Float PageRank
  * sums in nondeterministic order and drifts in the last ulps; integer
  * sums are associative-exact. The update is the standard damped walk
  * (Page et al., "The PageRank Citation Ranking", 1999):
  *
  *   r'(v) = ((den−num)·scale) div den
  *         + (num · (Σ_{u→v} r(u) div outdeg(u) + dangling div N)) div den
  *
  * with num/den the damping ratio (85/100), `scale` the per-node unit
  * mass, dangling = Σ r(u) over sink nodes (redistributed uniformly —
  * the random-surfer teleport), div = integer division (both Spark's
  * `div` and DuckDB's `//` truncate toward zero; all values here are
  * non-negative, so the engines agree). Overflow bound (documented, not
  * checked per-row): N · scale · num < 2^63 — at the default scale 1e9
  * that is 100M nodes; pass a smaller scale for a larger graph.
  *
  * Scale shape (100 TB): the EDGE list is the big side; it normalizes
  * (distinct, self-loops dropped), pre-joins its out-degree once,
  * hash-partitions on src ONCE and caches — `InMemoryRelation` reports
  * the partitioning, so each iteration's contribution join re-shuffles
  * only the slim (node, rank) frame. One shuffle per iteration
  * (contrib groupBy dst), the dangling mass rides a broadcast 1-row
  * cross join (no driver collect), and iterations localCheckpoint
  * every few rounds to keep the analyzer off an O(iters)-deep plan.
  * Fixed iteration count — rank use cases want a pinned, reproducible
  * artifact, not a convergence race.
  */
object LinkGraph {

  /** Registered-domain edges from crawled pages: extract outlinks,
    * resolve, drop nofollow (politeness: an explicitly disavowed link
    * is not an endorsement), key both ends by PSL registered domain,
    * drop intra-domain edges, distinct. Slim (src, dst) strings out;
    * page bytes never shuffle. */
  def hostEdges(pages: DataFrame, url: Column, html: Column): DataFrame = {
    val l = pages.select(
      UrlOps.registeredDomain(url).as("src"),
      explode(LinkExtract.links(html, url)).as("link"))
    l.filter(!col("link.nofollow"))
      .select(col("src"),
        UrlOps.registeredDomain(col("link.url")).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
  }

  /** Exact fixed-point PageRank over (src, dst) edges; node ids are any
    * orderable type (host strings, long ids). Returns (node, rank) with
    * rank in `scale` micro-units. See the object doc for the exact
    * update rule the DuckDB oracle replays. */
  def pagerank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iters: Int = 5,
      dampNum: Long = 85,
      dampDen: Long = 100,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a ratio in [0,1]")
    val e0 = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .persist()
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("od"))
    // The big cached side: every edge with its out-degree, partitioned
    // on src once; iterations join slim ranks against it. The dangling
    // node set and N are likewise derived ONCE — nothing inside the
    // loop reaches back to the input lineage.
    val eDeg = e0.join(outdeg, "src")
      .repartition(col("src"))
      .persist()
    val dangNodes = nodes
      .join(eDeg.select(col("src").as("node")), Seq("node"), "left_anti")
      .persist()
    val n = nodes.count() // one driver scalar, outside the loop
    if (n == 0) { // no edges: empty rank table, and no div-by-zero below
      eDeg.unpersist(); dangNodes.unpersist(); nodes.unpersist()
      return nodes.select(col("node"), lit(scale).as("rank"))
    }
    val base = ((dampDen - dampNum) * scale) / dampDen

    var ranks = nodes.select(col("node"), lit(scale).as("r"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val withRank = eDeg.join(
        ranks.select(col("node").as("src"), col("r")), "src")
      val contrib = withRank
        .select(col("dst").as("node"), expr("r div od").as("share"))
        .groupBy("node").agg(sum(col("share")).as("inflow"))
      // Dangling mass: rank not held by any edge source. One slim
      // broadcast row — no driver action inside the loop.
      val dang = ranks
        .join(dangNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
        .select(expr(s"dang div ${n}L").as("dang_share"))
      // Eager per-round checkpoint: each round is one SHALLOW job over
      // the cached graph + the previous round's materialized ranks —
      // never one deep plan nesting iters×joins (analyzer cost and
      // scheduler fan-out both stay flat in the iteration count).
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(base) + expr(
            s"($dampNum * (coalesce(inflow, 0L) + dang_share)) div $dampDen"))
            .as("r"))
        .localCheckpoint(true)
      i += 1
    }
    val out = ranks.select(col("node"), col("r").as("rank"))
    eDeg.unpersist()
    dangNodes.unpersist()
    nodes.unpersist()
    out
  }
}
