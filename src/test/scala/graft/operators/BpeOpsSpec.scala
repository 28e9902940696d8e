package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeOpsSpec extends AnyFunSuite {

  /** Reference BPE: overlap-inclusive pair counts, (cnt desc, pair asc)
    * winner, greedy left-to-right non-overlapping application. */
  private def referenceMerges(texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((step.toLong, a, b, c))
        words = words.toSeq.map { case (syms, f) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> f
        }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("bpeMerges matches the reference, incl. same-symbol overlap runs") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "aaaa" exercises the greedy-overlap parity ((a,a) counted 3× per
    // word but merged to (aa)(aa)); "banana" the classic multi-merge;
    // double space yields an empty token that must be ignored.
    val texts = Seq(
      "low low low lower lowest aaaa aaaa",
      "banana banana  banana bandana",
      "aaa ab ab ab ab")
    val got = graft.core.Caches.scoped {
      BpeOps.bpeMerges(texts.toDF("text"), 6)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    val expect = referenceMerges(texts, 6)
    assert(got == expect, s"got $got\nexpect $expect")
    // The same-symbol run really got exercised: some step merged (a, a) or
    // a derived aa-symbol.
    assert(expect.exists(m => m._2 == m._3), s"fixture lost its overlap case: $expect")
  }

  test("bpeVocab counts the reference segmentation's symbols") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq("low low lower aaaa", "banana band aaaa aa")
    val merges = 4
    val got = graft.core.Caches.scoped {
      BpeOps.bpeVocab(texts.toDF("text"), merges)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // Reference: replay the merges on the word table, count symbols.
    val table = referenceMerges(texts, merges).map(m => (m._2, m._3))
    var words: Map[Vector[String], Long] = texts
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong }
    table.foreach { case (a, b) =>
      words = words.toSeq.map { case (syms, f) =>
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            merged += (a + b); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.toVector -> f
      }.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    }
    val expect = words.toSeq
      .flatMap { case (syms, f) => syms.map(_ -> f) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    assert(got == expect, s"got $got\nexpect $expect")
  }

  /** Greedy left-to-right application of a merge table to one word. */
  private def segment(w: String, table: Seq[(String, String)]): Vector[String] = {
    var syms = w.toVector.map(_.toString)
    table.foreach { case (a, b) =>
      val merged = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          merged += (a + b); i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.toVector
    }
    syms
  }

  test("bpeDocTokens sums segmented word lengths per document") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq((1L, "low lower banana"), (2L, "aaaa aa low"), (3L, "banana band"))
    val merges = 5
    val got = graft.core.Caches.scoped {
      BpeOps.bpeDocTokens(rows.toDF("doc_id", "text"), "doc_id", merges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val table = referenceMerges(rows.map(_._2), merges).map(m => (m._2, m._3))
    val expect = rows.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).map(w => segment(w, table).length.toLong).sum
    }.toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("sampleCap bounds the training table: tail words stop contributing") {
    val spark = TestSpark.spark
    import spark.implicits._
    // "zz" appears 5x (top word), "qq" 3x, "ab" once. With the full table
    // (z,z) wins round 1 and (q,q) round 2; capped to the single most
    // frequent word, only zz's pairs exist and training exhausts after it.
    val texts = Seq("zz zz zz zz zz qq qq qq ab")
    val full = BpeOps.bpeMerges(texts.toDF("text"), 3)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(full.take(2) == Seq(("z", "z"), ("q", "q")))
    val capped = BpeOps.bpeMerges(texts.toDF("text"), 3, sampleCap = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(capped == Seq(("z", "z")))
    // Application is still corpus-wide: the vocabulary segments EVERY word
    // (qq/ab stay character-split under the capped table).
    val vocab = BpeOps.bpeVocab(texts.toDF("text"), 3, sampleCap = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("zz" -> 5L, "q" -> 6L, "a" -> 1L, "b" -> 1L))
  }

  test("count ties break in CODE-POINT order (UTF-8/SQL collation), not UTF-16") {
    // U+FFFD (65533) < U+1F600 (128512) by code point — the order Spark's
    // UTF8String and DuckDB both sort by — but JVM String.compareTo puts
    // the emoji's surrogates (0xD83D...) FIRST. A tie between the two
    // pairs must pick the U+FFFD pair or the merge table diverges from
    // the SQL oracle on any non-BMP corpus.
    val rep = "�"
    val emoji = new String(Character.toChars(0x1F600))
    assert(BpeOps.cpCompare(rep, emoji) < 0)
    assert(rep.compareTo(emoji) > 0, "fixture must expose the UTF-16 disagreement")
    val words = Array(
      (BpeOps.codePointSyms(emoji + emoji), 1L),
      (BpeOps.codePointSyms(rep + rep), 1L))
    val learned = BpeOps.trainInMemory(words, 1)
    assert(learned == Seq((1L, rep, rep, 1L)), s"wrong tie winner: $learned")
  }

  test("bpeMerges stops early when no pairs remain") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = graft.core.Caches.scoped {
      BpeOps.bpeMerges(Seq("ab ab cd").toDF("text"), 10).collect()
    }
    // "ab"/"cd" exhaust after at most 3 merges (ab, cd, then nothing).
    assert(got.length <= 3 && got.nonEmpty)
    assert(got.map(_.getLong(0)).toSeq == (1L to got.length).toSeq)
  }

  test("shared BpeModel: one training run yields the same merges, vocab, and doc tokens as retraining") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest low"), (2L, "new newer newest"),
      (3L, "low new low")).toDF("doc_id", "text")
    graft.core.Caches.scoped {
      // Deployment shape: train ONCE, derive every surface from the model.
      val m = BpeOps.bpeModel(docs, 6)
      val merges1 = BpeOps.mergesOf(m).collect().map(_.toSeq).toSeq
      val vocab1 = BpeOps.vocabOf(m).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val toks1 = BpeOps.docTokensOf(m, docs, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // Gate shape: each surface retrains from scratch. Results must be
      // identical — the model is a pure cost optimization.
      assert(BpeOps.bpeMerges(docs, 6).collect().map(_.toSeq).toSeq == merges1)
      assert(BpeOps.bpeVocab(docs, 6).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet == vocab1)
      assert(BpeOps.bpeDocTokens(docs, "doc_id", 6).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet == toks1)
    }
  }
}
