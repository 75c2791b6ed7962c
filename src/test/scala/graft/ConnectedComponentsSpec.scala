package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, Dedup}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("V-shape pairs collapse to one component (the min-partner bug)") {
    // Banding emits (1,3) and (2,3) without (1,2): node 2's only partner
    // is larger than itself, so the old min-partner pointer chase left
    // 2 -> 2 and split the {1,2,3} cluster. True components must not.
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val comp = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))

    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "z"))
      .toDF("doc_id", "text")
    val canon = Dedup
      .canonicalizeFixpoint(docs, pairs.withColumn("jaccard", lit(1.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("ascending chain needs propagation, not just jumping") {
    // 1-2-3-4-...: labels must flow hop by hop AGAINST the id order too:
    // edges (10,20),(20,30),(30,40) with ids reversed exercise it.
    val pairs = Seq((40L, 30L), (30L, 20L), (20L, 10L), (99L, 98L))
      .toDF("id_a", "id_b")
    val comp = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      98L -> 98L, 99L -> 98L))
  }

  test("random graph matches an in-spec BFS reference") {
    val rnd = new Random(42)
    val n = 400
    // Sparse random edges: ~0.9 per node, leaving many singletons, plus
    // deliberate long paths in shuffled id order.
    val randomEdges = Seq.fill(360)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val shuffled = rnd.shuffle((0 until n by 7).toList)
    val pathEdges = shuffled.zip(shuffled.tail)
      .map { case (a, b) => (a.toLong, b.toLong) }
    val all = (randomEdges ++ pathEdges).filter(e => e._1 != e._2)

    // Reference: plain BFS union over an adjacency map.
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    all.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val expect = mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!expect.contains(start)) {
        val seen = mutable.Set(start)
        val queue = mutable.Queue(start)
        while (queue.nonEmpty) {
          val x = queue.dequeue()
          adj(x).foreach(y => if (seen.add(y)) queue.enqueue(y))
        }
        val label = seen.min
        seen.foreach(v => expect(v) = label)
      }
    }

    val got = ConnectedComponents
      .components(all.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect.toMap)
  }

  test("self-loops, duplicate pairs and nulls are inert; empty in → empty out") {
    val pairs = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(1L)), (Some(1L), Some(1L)),
      (Some(1L), Some(2L)), (None, Some(5L)), (Some(6L), None))
      .toDF("id_a", "id_b")
    val comp = ConnectedComponents.components(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L))

    val empty = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("node_id", "component_id"))
  }

  test("assign is total over docs and bestPerCluster composes") {
    val docs = (1L to 8L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 7L), (5L, 7L)).toDF("id_a", "id_b")
    val assign = ConnectedComponents.assign(docs, pairs)
    val m = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 2L,
      6L -> 6L, 7L -> 2L, 8L -> 8L))
    val scores = docs.select(col("doc_id"),
      (col("doc_id") % 3).as("quality_score"))
    val best = Dedup.bestPerCluster(assign, scores)
      .filter(col("cluster_size") > 1).collect()
    assert(best.length == 1)
    // 2 % 3 == 5 % 3 == 2 tie at the max; ties break to the smaller id
    assert(best.head.getAs[Long]("keep_id") == 2L)
    assert(best.head.getAs[Long]("cluster_size") == 3L)
  }

  test("string node ids work (URL/host dedup graphs)") {
    val pairs = Seq(("b.com/x", "c.com/y"), ("a.com/z", "c.com/y"))
      .toDF("id_a", "id_b")
    val comp = ConnectedComponents.components(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp == Map("a.com/z" -> "a.com/z", "b.com/x" -> "a.com/z",
      "c.com/y" -> "a.com/z"))
  }

  test("non-convergence within maxIter refuses loudly") {
    val pairs = (1L to 64L).sliding(2).toSeq
      .map(s => (s.head, s.last)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.components(pairs, maxIter = 1).count()
    }
    assert(e.getMessage.contains("converge"))
  }
}
