package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sessionize, TextAnalysis => T}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counting: whitespace and BPE-ish") {
    val df = Seq(
      ("hello world", 2L, 2L),
      ("", 0L, 0L),
      ("  spaced   out  ", 2L, 2L),
      ("don't stop! 123 go", 4L, 7L) // don ' t stop ! 123 go
    ).toDF("text", "ws", "bpe")
    val got = df.select(
      T.tokenCount($"text").as("ws2"), T.bpeTokenCount($"text").as("bpe2"),
      $"ws", $"bpe").collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), s"ws mismatch: $r")
      assert(r.getLong(1) == r.getLong(3), s"bpe mismatch: $r")
    }
  }

  test("language ID by stopword vote") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "le chat est dans la maison et il est content",
      "der hund ist ein guter freund und die katze",
      "xyzzy plugh").toDF("text")
    val got = df.select(T.langId($"text")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "fr", "de", "und"))
  }

  test("quality scoring components") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, ""),
      (3L, "!!! ??? ... ;;; :::")).toDF("doc_id", "text")
    val q = T.quality(df, $"text").orderBy("doc_id").collect()
    val good = q(0)
    assert(good.getAs[Long]("n_tokens") == 12L)
    assert(good.getAs[Double]("quality_score") == 1.0)
    assert(q(1).getAs[Double]("quality_score") < 0.5)
    assert(q(2).getAs[Double]("punct_ratio") > 0.5)
  }

  test("repetition signals: dup lines, dup paragraphs, hot-line share") {
    val docs = Seq(
      // 4 lines: a, b, a, b → 2 distinct / 4 → dup_line 0.5;
      // paragraphs "a\nb" twice → dup_para 0.5; each line 1 char,
      // max line chars = 2 of 4 → 0.5
      (1L, "a\nb\n\na\nb"),
      // all unique
      (2L, "x\ny\nz"),
      // blank/whitespace lines ignored; single paragraph
      (3L, "  \nonly\n  \n"),
      (4L, ""),
      // hot line: "dup" twice (6 chars) vs "unique-longer" (13) → 6/19
      (5L, "dup\nunique-longer\ndup")
    ).toDF("doc_id", "text")
    val got = T.repetition(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toList
    // doc 1: every line duplicated → all 4 chars sit in dup lines
    assert(got(0) == ((1L, 0.5, 0.5, 1.0)), s"got ${got(0)}")
    assert(got(1) == ((2L, 0.0, 0.0, 0.0)), s"got ${got(1)}")
    assert(got(2)._2 == 0.0 && got(2)._3 == 0.0 && got(2)._4 == 0.0,
      s"got ${got(2)}")
    assert(got(3) == ((4L, 0.0, 0.0, 0.0)), s"got ${got(3)}")
    // doc 5: "dup" twice = 6 chars of 19 total in duplicated lines
    assert(got(4)._4 == 6.0 / 19, s"got ${got(4)}")
  }

  test("fingerprint is stable and edit-robust-ish") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "the quick brown fox jumps over the lazy dog"),
      ("c", "an utterly different document about query planners")
    ).toDF("id", "text")
    val fp = df.select($"id", T.fingerprint($"text").as("f")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("a") == fp("b"))
    assert(fp("a") != fp("c"))
  }

  test("sessionize splits on gaps > 30min and summarizes") {
    val df = Seq(
      (1L, 100L, "2024-01-01 10:00:00"),
      (2L, 100L, "2024-01-01 10:10:00"),
      (3L, 100L, "2024-01-01 11:00:00"), // 50-min gap → new session
      (4L, 200L, "2024-01-01 09:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s"))
    val sess = Sessionize(df).orderBy("event_id")
      .select("session_idx").collect().map(_.getLong(0)).toSeq
    assert(sess == Seq(1L, 1L, 2L, 1L))
    val summary = Sessionize.summarize(df)
      .orderBy("user_id", "session_idx").collect()
    assert(summary.length == 3)
    assert(summary(0).getAs[Long]("n_events") == 2L)
    assert(summary(0).getAs[Long]("duration_s") == 600L)
  }

  test("TextStats token count matches split semantics on whitespace edges") {
    // Spark split(limit -1) keeps leading AND trailing empty tokens for
    // non-space whitespace that survives the space-only trim; the
    // one-walk kernel must agree exactly with the built-in composition.
    val df = Seq("alpha beta\t", "\t", "x\t\t", "\tx", "", "a b", " pad ")
      .toDF("text")
    val kernel = df.select(T.stats($"text").getField("n_tokens"))
      .collect().map(_.getLong(0)).toSeq
    val builtin = df.select(T.tokenCount($"text"))
      .collect().map(_.getLong(0)).toSeq
    assert(kernel == builtin, s"kernel=$kernel builtin=$builtin")
  }

  test("sessionize works with custom column names and no id column") {
    val df = Seq(
      (100L, "2024-01-01 10:00:00"),
      (100L, "2024-01-01 11:00:00"),
      (200L, "2024-01-01 09:00:00"))
      .toDF("uid", "s")
      .withColumn("when", to_timestamp($"s"))
    val sess = Sessionize(df, userCol = "uid", tsCol = "when")
      .orderBy("uid", "when")
      .select("session_idx").collect().map(_.getLong(0)).toSeq
    assert(sess == Seq(1L, 2L, 1L))
  }

  test("langid agrees with testdata lang labels for english docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // Synthetic texts are mostly topic words; just require the operator
    // runs over real data and yields only known labels.
    val labels = docs.select(T.langId($"text")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "fr", "de", "es", "und")))
  }

  test("redact replaces emails, urls, long digit runs") {
    val df = Seq(
      "mail me at a.b+c@foo.co.uk today",
      "see https://x.y/z?q=1 now",
      "card 1234567890 vs pin 1234",
      "clean text").toDF("text")
    val got = df.select(T.redact($"text")).collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "mail me at <EMAIL> today",
      "see <URL> now",
      "card <NUM> vs pin 1234",
      "clean text"))
  }

  test("sequence packing respects the token budget and is exhaustive") {
    val docs = (1L to 40L).map(i => (i, (i % 7) * 100 + 50))
      .toDF("doc_id", "n_tokens")
    val packed = graft.operators.SequencePacker
      .pack(docs, maxTokens = 1000, shards = 4)
    val rows = packed.collect()
    assert(rows.length == 40) // every doc assigned exactly once
    // budget: no pack exceeds 1000 unless it is a single oversized doc
    val byPack = rows.groupBy(_.getAs[Long]("pack_id"))
    byPack.foreach { case (_, ps) =>
      val total = ps.map(_.getAs[Long]("pack_tokens")).max
      assert(total <= 1000 || ps.length == 1)
    }
    // deterministic across runs
    val again = graft.operators.SequencePacker
      .pack(docs, maxTokens = 1000, shards = 4).collect()
    assert(rows.map(_.toString).sorted.toSeq
      == again.map(_.toString).sorted.toSeq)
  }

  test("chunking: sliding windows with overlap, remainder tail, no shuffle") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")), // 20 tokens
      (2L, "a b c"),                                   // shorter than chunk
      (3L, (1 to 12).map(i => s"x$i").mkString(" "))   // exactly one stride
    ).toDF("doc_id", "text")
    val out = T.chunk(docs, chunkTokens = 8, overlapTokens = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: stride 6 -> starts 0,6,12; the window at 12 reaches token 20
    // so no start-18 window follows (it would add zero new tokens — the
    // trailing chunk would be fully contained in its predecessor)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == Seq(0, 1, 2))
    assert(out.find(r => r._1 == 1L && r._2 == 0).get._3 ==
      (1 to 8).map(i => s"w$i").mkString(" "))
    assert(out.find(r => r._1 == 1L && r._2 == 1).get._3 ==
      (7 to 14).map(i => s"w$i").mkString(" ")) // 2-token overlap
    assert(out.find(r => r._1 == 1L && r._2 == 2).get._3 ==
      (13 to 20).map(i => s"w$i").mkString(" ")) // full tail, reaches end
    // doc 2: one short chunk, n_tokens = actual length
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b c", 3)))
    // doc 3 (12 tokens, stride 6): starts 0 and 6
    assert(out.filter(_._1 == 3L).map(_._4).toSeq == Seq(8, 6))
    // every token of doc 1 appears in some chunk (coverage)
    val covered = out.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert((1 to 20).map(i => s"w$i").toSet == covered)
    // pure projection: no exchange in the plan
    val plan = T.chunk(docs, 8, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("chunk property: coverage, overlap, and bounds on random docs") {
    val rnd = new scala.util.Random(99L)
    val docs = (0 until 40).map { i =>
      val n = 1 + rnd.nextInt(60)
      (i.toLong, (1 to n).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val size = 8; val overlap = 3; val stride = size - overlap
    val out = T.chunk(docs, size, overlap)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.collect().foreach { r =>
      val (id, toks) = (r.getLong(0), r.getString(1).split(" ").toSeq)
      val chunks = byDoc(id)
      // dense chunk ids; every chunk within size bound, tail may be short
      assert(chunks.map(_._2).toList == chunks.indices.toList)
      chunks.foreach { c => assert(c._4 <= size && c._4 >= 1) }
      // n_tokens matches the actual token count of the chunk text
      chunks.foreach { c =>
        assert(c._3.split(" ").length == c._4, s"doc $id chunk $c") }
      // coverage: concatenating de-overlapped chunks rebuilds the doc
      val rebuilt = chunks.toSeq.zipWithIndex.flatMap { case (c, i) =>
        val t = c._3.split(" ").toSeq
        if (i == 0) t else t.drop(overlap min t.length)
      }
      // consecutive chunks agree on their overlapping tokens
      chunks.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          val at = a._3.split(" ").toSeq; val bt = b._3.split(" ").toSeq
          assert(at.drop(stride) == bt.take(at.length - stride),
            s"doc $id overlap mismatch: $at vs $bt")
        case _ =>
      }
      assert(rebuilt == toks, s"doc $id coverage: $rebuilt != $toks")
      // every chunk past the first adds at least one NEW token: a doc
      // ending inside the overlap region must not emit a trailing window
      // fully contained in its predecessor (duplicated training content)
      chunks.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(
          b._3.split(" ").length > a._3.split(" ").length - stride,
          s"doc $id: chunk ${b._2} adds no new tokens over ${a._2}")
        case _ =>
      }
    }
  }

  test("chunking: a doc ending inside the overlap emits no duplicate tail") {
    // 8 tokens, chunk 8, overlap 3 — the old start sequence (0, 5) made a
    // second window of tokens 6..8, fully contained in the first.
    val docs = Seq((1L, (1 to 8).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = T.chunk(docs, chunkTokens = 8, overlapTokens = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    assert(out.toSeq ==
      Seq((0, (1 to 8).map(i => s"w$i").mkString(" "), 8)))
  }

  test("chunking runs stateless on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(1L -> (1 to 20).map(i => s"w$i").mkString(" "))
    val q = T.chunk(mem.toDF().toDF("doc_id", "text"),
        chunkTokens = 8, overlapTokens = 2)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("chunk_stream").collect()
    assert(got.length == 3) // starts 0,6,12 — same as batch
    assert(got.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
  }
}
