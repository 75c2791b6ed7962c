package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // The classic BPE teaching corpus (Sennrich et al. §3.2 shape):
  // frequencies force a deterministic merge order.
  private def classic = Seq(
    Seq.fill(5)("low").mkString(" "),
    Seq.fill(2)("lower").mkString(" "),
    Seq.fill(6)("newest").mkString(" "),
    Seq.fill(3)("widest").mkString(" "))
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    .toDF("doc_id", "text")

  test("training learns the classic merge sequence on the teaching " +
      "corpus") {
    val model = Bpe.train(classic, numMerges = 4)
    // 'es' appears 9 times (newest 6 + widest 3) — the top pair; then
    // 'es t' (9), 'est </w>' (9), then 'l o' (7, low+lower).
    assert(model.merges == Seq(("e", "s"), ("es", "t"),
      ("est", "</w>"), ("l", "o")), s"got ${model.merges}")
  }

  test("encoding resolves trained words to big subwords and unseen " +
      "words to characters") {
    val model = Bpe.train(classic, numMerges = 10)
    val enc = Seq((0L, "newest"), (1L, "lowest"), (2L, "xyz"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), model).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    // a fully-trained word collapses far below its character count
    assert(enc(0L).length <= 3, s"newest: ${enc(0L)}")
    assert(enc(0L).mkString == "newest</w>", "subwords must concatenate " +
      s"back to the word + marker: ${enc(0L)}")
    // 'lowest' shares both the 'lo' and 'est</w>' merges
    assert(enc(1L).contains("est</w>") || enc(1L).contains("lowest</w>"),
      s"lowest: ${enc(1L)}")
    // OOV text falls back to characters + end marker, never drops
    assert(enc(2L).mkString == "xyz</w>", s"xyz: ${enc(2L)}")
  }

  test("token counts: trained vocabulary compresses, and the count is " +
      "what a packer would act on") {
    val model = Bpe.train(classic, numMerges = 10)
    val counts = classic
      .select(col("doc_id"), Bpe.tokenCount(col("text"), model).as("n"),
        size(split(col("text"), " ")).as("words"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    counts.foreach { case (id, n, words) =>
      assert(n <= words * 4,
        s"doc $id: trained encoding must compress toward whole words " +
          s"($n tokens for $words words)")
      assert(n >= words, "every word yields at least one token")
    }
    // the most frequent words collapse to a SINGLE token each
    val low = counts.find(_._1 == 0L).get // "low" × 5
    val newest = counts.find(_._1 == 2L).get // "newest" × 6
    assert(low._2 == low._3 && newest._2 == newest._3,
      s"frequent words must be single tokens: $counts")
  }

  test("empty, null-ish and punctuation-only text encode to zero tokens") {
    val model = Bpe.train(classic, numMerges = 4)
    val enc = Seq((0L, ""), (1L, "  !! .. "), (2L, "a"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), model).as("t"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(enc(0L).isEmpty && enc(1L).isEmpty)
    assert(enc(2L) == Seq("a", "</w>") || enc(2L) == Seq("a</w>"))
  }

  test("training is deterministic under repartition and ties break " +
      "lexicographically") {
    val corpus = (0 until 50)
      .map(i => (i.toLong, s"alpha beta gamma delta word$i"))
      .toDF("doc_id", "text")
    val a = Bpe.train(corpus, numMerges = 8).merges
    val b = Bpe.train(corpus.repartition(7), numMerges = 8).merges
    assert(a == b, s"$a vs $b")
  }

  test("encode plan is a pure projection — no exchange, no join") {
    val model = Bpe.train(classic, numMerges = 4)
    val plan = classic
      .select(Bpe.encode(col("text"), model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }
}
