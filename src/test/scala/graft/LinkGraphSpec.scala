package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Exact integer reference replaying the documented update rule. */
  private def ref(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val e = edges.distinct.filter(p => p._1 != p._2)
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val od = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    var r = nodes.map(_ -> Scale).toMap
    val base = (15L * Scale) / 100L
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(p => r(p._1) / od(p._1)).sum
      }
      val dang = nodes.filterNot(od.contains).map(r).sum
      val ds = dang / n
      r = nodes.map(v =>
        v -> (base + (85L * (inflow.getOrElse(v, 0L) + ds)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pagerank(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bit-identical to the integer reference on a diamond with a sink") {
    // 1 -> {2,3} -> 4 ; 4 is dangling (teleport redistributes its mass)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    for (k <- Seq(0, 1, 3, 5)) assert(run(e, k) == ref(e, k), s"iters=$k")
  }

  test("bit-identical on a denser graph incl. a cycle and multi-edges") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (1L, 4L), (2L, 4L), (1L, 2L), (2L, 2L)) // dup + self-loop
    for (k <- Seq(2, 6)) assert(run(e, k) == ref(e, k), s"iters=$k")
  }

  test("mass conservation and floor: ranks >= base, total <= N*scale") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L))
    val r = run(e, 8)
    val base = (15L * Scale) / 100L
    assert(r.values.forall(_ >= base))
    // integer division only loses mass, never creates it
    assert(r.values.sum <= 5L * Scale)
    // the cycle 1-2-3-4 accumulates; the pure source 5 holds the floor
    assert(r(5L) == base)
    assert(r(1L) > r(5L))
  }

  test("string node keys work (host graph)") {
    val e = Seq(("a.com", "b.com"), ("b.com", "a.com"), ("c.com", "a.com"))
    val out = LinkGraph.pagerank(e.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("a.com", "b.com", "c.com"))
    assert(out("a.com") > out("c.com"))
  }

  test("hostEdges: registered-domain edges, nofollow and intra-domain drop") {
    val pages = Seq(
      ("https://blog.site-a.co.uk/post",
        """<a href="https://www.site-b.com/x">b</a>
          |<a href="/local">self</a>
          |<a rel="nofollow" href="https://spam.test/y">no</a>
          |<a href="https://docs.site-b.com/z">b2</a>""".stripMargin),
      ("https://site-b.com/home",
        """<a href="https://site-a.co.uk/">a</a>""".stripMargin)
    ).toDF("url", "html")
    val e = LinkGraph.hostEdges(pages, col("url"), col("html"))
      .as[(String, String)].collect().toSet
    assert(e == Set(
      ("site-a.co.uk", "site-b.com"), // www. + docs. collapse: one edge
      ("site-b.com", "site-a.co.uk")))
  }
}
