package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair edge list — the cluster
  * resolution step between candidate-pair generation (MinHash banding,
  * SimHash, embedding near-dup) and keep-one selection.
  *
  * Why a dedicated operator: a one-step "map every node to its minimum
  * partner" assignment is NOT transitive closure. MinHash banding emits
  * pairs independently per band, so V-shapes arise naturally — doc 1
  * collides with doc 3 in band x, doc 2 with doc 3 in band y, and the
  * (1,2) pair never materializes. Under min-partner mapping node 2 keeps
  * itself (its only partner, 3, is larger) while 3 maps to 1: the true
  * {1,2,3} cluster silently splits and the "duplicate" survives dedup.
  * Components must be computed over the GRAPH, not the pair list.
  *
  * Algorithm: min-label propagation with pointer jumping (the
  * "hash-to-min" family — Rastogi et al., "Finding Connected Components
  * in Map-Reduce in Logarithmic Rounds", ICDE 2013; the alternating
  * large-star/small-star formulation is Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014). Each round every
  * node's label becomes the minimum of: its own label, its neighbours'
  * labels (one join along the edge list), and its label's label (one
  * self-join — the pointer jump that turns O(diameter) propagation into
  * O(log diameter) rounds). Labels are monotonically non-increasing and
  * always hold the id of a node inside the same component, so the
  * fixpoint — where both joins improve nothing — has every edge's
  * endpoints agreeing on the component's minimum id.
  *
  * Scale shape (100 TB): the edge list — the big side at corpus scale —
  * is normalized (bidirectional, self-loops dropped, band-duplicate
  * pairs collapsed), hash-partitioned on the source endpoint ONCE and
  * cached; `InMemoryRelation` reports that partitioning to the planner,
  * so every round's propagation join reuses the cached layout and only
  * the (node, label) frame — one slim row per node — shuffles per round.
  * Generations are eagerly `localCheckpoint`ed: the lineage truncation
  * keeps round N's plan from nesting N joins (analyzer cost), and the
  * materialized blocks make the per-round convergence count a cache
  * read. Rounds are O(log diameter); near-dup graphs are
  * shallow-diameter in practice (star-ish around popular content), so
  * typical corpora converge in a handful of rounds.
  */
object ConnectedComponents {

  /** Component assignment for every node that appears in `pairs`:
    * (node_id, component_id) with component_id = the minimum node id in
    * the node's connected component. Nodes absent from `pairs` are
    * absent from the result — join the full corpus back with
    * [[assign]] (or coalesce to self) for a total assignment.
    *
    * Throws if the fixpoint is not reached within `maxIter` rounds
    * (2^maxIter effective propagation distance): a silently partial
    * labelling would re-introduce exactly the split-cluster bug this
    * operator exists to prevent.
    */
  def components(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 50): DataFrame = {
    // Node ids stay their INPUT type — the algorithm needs only an
    // ordering (least/min), which longs and strings both have; a cast
    // to long would silently null out string keys (URL-dedup graphs)
    // and return an empty labelling.
    val e0 = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
    // Bidirectional + distinct (banding emits a pair once per colliding
    // band); partitioned on u once, reused by every round's join.
    val edges = e0
      .union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(col("u"))
      .persist()

    // Init: l(v) = min(v, min neighbour) — one aggregate over the cache.
    var labels = edges.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("mn"))
      .select(col("node"), least(col("node"), col("mn")).as("label"))
      .localCheckpoint(true)

    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // Propagate along edges: per node, the min label among neighbours.
      val viaEdges = edges
        .join(labels, edges("u") === labels("node"))
        .groupBy(edges("v").as("node"))
        .agg(min(col("label")).as("nbr_label"))
      // Pointer jump: the label's own label.
      val viaJump = labels
        .select(col("node").as("jn"), col("label").as("jl"))
      val cur = labels.select(col("node"), col("label").as("old"))
      val next = cur
        .join(viaEdges, Seq("node"), "left")
        .join(viaJump, cur("old") === col("jn"), "left")
        .select(col("node"),
          least(col("old"),
            coalesce(col("nbr_label"), col("old")),
            coalesce(col("jl"), col("old"))).as("label"),
          col("old"))
        .localCheckpoint(true)
      val moved = next.filter(col("label") < col("old")).limit(1).count()
      labels = next.drop("old")
      converged = moved == 0
      i += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds " +
        "(pathological chain graph?); raise maxIter")
    labels.select(col("node").as("node_id"), col("label").as("component_id"))
  }

  /** Total canonical assignment over a corpus: every doc maps to the
    * minimum id of its duplicate component, docs with no pairs map to
    * themselves. Output (doc_id, canonical_id) — the input shape
    * [[Dedup.bestPerCluster]] consumes. */
  def assign(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      maxIter: Int = 50): DataFrame = {
    val comp = components(pairs, maxIter = maxIter)
    docs.join(comp, docs(idCol) === comp("node_id"), "left")
      .select(docs(idCol),
        coalesce(col("component_id"), docs(idCol)).as("canonical_id"))
  }
}
