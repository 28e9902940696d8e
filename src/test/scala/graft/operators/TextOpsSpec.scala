package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite with graft.core.PropHelpers {

  private def piiRow(text: String): (Long, Long, Long, String) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(TextOps.piiCountCols(col("text")) :+
        TextOps.redactPiiCol(col("text")).as("red"): _*)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("chunkRows: window boundaries, trailing partial, short and empty docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 10 tokens, chunkLen 4, stride 3: starts 0,3,6 (start 6 reaches the
    // end with a 4-token window exactly); 11 tokens adds a partial at 9.
    val toks10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val toks11 = (1 to 11).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks10), (2L, toks11), (3L, "a b"), (4L, ""), (5L, "  "))
      .toDF("doc_id", "text")
    val got = TextOps.chunkRows(df, "doc_id", 4, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "t1 t2 t3 t4", 4L), (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 0L, "t1 t2 t3 t4", 4L), (2L, 1L, "t4 t5 t6 t7", 4L),
      (2L, 2L, "t7 t8 t9 t10", 4L), (2L, 3L, "t10 t11", 2L),
      (3L, 0L, "a b", 2L)))       // short doc: one partial chunk; empty: none
    // Every token of every doc appears in at least one chunk (stride <=
    // chunkLen means no gaps).
    val covered = got.filter(_._1 == 2L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 11).map(i => s"t$i").toSet)
  }

  test("redactPiiCol replaces urls, emails, phones; counts mirror replacements") {
    val (u1, e1, p1, r1) = piiRow("email a@b.co visit https://c.de/path-1 call 111-222-3333")
    assert((u1, e1, p1) == ((1L, 1L, 1L)))
    assert(r1 == "email <EMAIL> visit <URL> call <PHONE>")
    val (u2, e2, p2, r2) = piiRow("contact alice@example.com or bob.smith@test.org")
    assert((u2, e2, p2) == ((0L, 2L, 0L)))
    assert(r2 == "contact <EMAIL> or <EMAIL>")
  }

  test("phone- and email-like substrings inside a URL redact as the URL, not separately") {
    // The staged order (URL first) must swallow the embedded phone pattern;
    // an unstaged count would report n_phone = 1 here.
    val (u, e, p, red) = piiRow("fetch https://x.com/a/123-456-7890 today")
    assert((u, e, p) == ((1L, 0L, 0L)), s"got ($u, $e, $p)")
    assert(red == "fetch <URL> today")
  }

  test("pii ops pass through clean and degenerate text") {
    assert(piiRow("no pii here at all") == ((0L, 0L, 0L, "no pii here at all")))
    assert(piiRow("") == ((0L, 0L, 0L, "")))
  }

  /** Scala brute force of the six Gopher rules, mirroring gopherReport's
    * integer arithmetic exactly. */
  private def gopherViol(t: String): Map[String, Boolean] = {
    val w = t.split(" ", -1).toSeq
    val nw = w.size
    val letters = t.length - (nw - 1)
    val alpha = w.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    val stops = w.count(TextOps.GopherStops.contains)
    val symbols = w.count(x => x.contains("#") || x.endsWith("..."))
    val topBg = if (nw < 2) 0
      else w.sliding(2).map(_.mkString(" ")).toSeq
        .groupBy(identity).map(_._2.size).max
    Map(
      "word_count"    -> (nw < 50 || nw > 100000),
      "mean_word_len" -> (letters < nw * 3 || letters > nw * 10),
      "alpha_words"   -> (alpha * 10 < nw * 8),
      "stop_words"    -> (stops < 2),
      "top_bigram"    -> (topBg * 5 > math.max(nw - 1, 0)),
      "symbol_ratio"  -> (symbols * 10 > nw))
  }

  test("gopherReport: rules fire independently; kept counts fully clean docs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq(
      // Clean: 56 tokens, stops everywhere, varied bigrams, all-alpha.
      Seq.fill(7)("the data and model that have with training").mkString(" "),
      "the of",                                         // short (and short-word)
      Seq.fill(60)("42 7 19").flatMap(_.split(" ")).mkString(" "), // numeric: alpha + stops fire
      (1 to 60).map(i => s"tok$i").mkString(" "),       // no stop words
      ("the of " + Seq.fill(30)("spam ham").mkString(" ")), // one dominant bigram
      ("the of " + (1 to 60).map(_ => "#tag").mkString(" "))) // symbols
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextOps.gopherReport(docs, "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viols = texts.map(gopherViol)
    val expected = gopherViol("x").keys.map(rule =>
      rule -> viols.count(_(rule)).toLong).toMap +
      ("kept" -> viols.count(v => !v.values.exists(identity)).toLong)
    assert(got == expected, s"got $got expected $expected")
    // The fixture's intent, pinned: exactly one doc is fully clean, and
    // every rule except mean_word_len fires at least once (the numeric
    // doc's 2-char tokens also trip the lower mean-word-length bound).
    assert(got("kept") == 1L)
    assert(gopherViol(texts(2))("mean_word_len"))
    Seq("word_count", "alpha_words", "stop_words", "top_bigram",
      "symbol_ratio").foreach(r => assert(got(r) >= 1L, r))
  }

  test("property: gopherReport equals the brute-force rule replay on random corpora") {
    import org.scalacheck.Gen
    val spark = TestSpark.spark
    import spark.implicits._
    // Tokens spanning every rule's trigger surface: stops, long words,
    // numerics (no letters), symbol shapes, and a tiny repeat pool that
    // makes top-bigram dominance reachable.
    val tokGen = Gen.oneOf("the", "and", "xyzzy", "42", "#tag", "ok...",
      "superlongword", "a1", "b2")
    val docGen = Gen.chooseNum(1, 70).flatMap(len =>
      Gen.listOfN(len, tokGen).map(_.mkString(" ")))
    val corpusGen = Gen.chooseNum(1, 8).flatMap(m => Gen.listOfN(m, docGen))
    forAll(corpusGen, n = 10) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextOps.gopherReport(docs, "doc_id")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val viols = texts.map(gopherViol)
      val expected = gopherViol("x").keys.map(rule =>
        rule -> viols.count(_(rule)).toLong).toMap +
        ("kept" -> viols.count(v => !v.values.exists(identity)).toLong)
      assert(got == expected, s"texts=$texts\ngot $got\nexpected $expected")
    }
  }
}
