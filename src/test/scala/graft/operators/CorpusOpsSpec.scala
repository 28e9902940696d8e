package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.PropHelpers

class CorpusOpsSpec extends AnyFunSuite with PropHelpers {

  private def docsDF(rows: (Long, String, String)*) = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  // ------------------------------------------------------------- KMinAgg

  test("KMinAgg buffer: k smallest distinct, sorted, bounded") {
    val agg = new CorpusOps.KMinAgg(3)
    val gen = Gen.listOf(Gen.oneOf((1 to 8).map(i => f"v$i%02d")))
    forAll(gen, 60) { vs =>
      val split = vs.length / 2
      val b = agg.merge(
        vs.take(split).foldLeft(agg.zero)(agg.reduce),
        vs.drop(split).foldLeft(agg.zero)(agg.reduce))
      val expect = vs.distinct.sorted.take(3)
      assert(b == expect, s"input $vs")
      assert(agg.finish(b) == (if (expect.length == 3) expect.last else null))
    }
  }

  test("kmin_distinct over a shuffled DataFrame matches the sorted-distinct oracle") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(7)
    val vals = (1 to 500).map(_ => f"h${r.nextInt(120)}%03d")
    val kth = vals.distinct.sorted.apply(63)
    val got = vals.toDF("v").repartition(8)
      .agg(CorpusOps.kmin_distinct(col("v"), 64).as("k"))
      .head().getString(0)
    assert(got == kth)
    // Fewer than k distinct values → null (sketch never saturates).
    val under = Seq("a", "b", "a").toDF("v")
      .agg(CorpusOps.kmin_distinct(col("v"), 64)).head().getString(0)
    assert(under == null)
  }

  // --------------------------------------------------------- kmvDistinct

  test("kmvDistinct: exact count right, estimate within KMV error bounds") {
    // 15 docs x 40 tokens of disjoint vocab per source => 15*38 = 570
    // distinct 3-gram shingles; k=64 gives stderr ~ 1/sqrt(62) ~ 13%.
    val rows = for {
      src <- Seq("sA", "sB"); i <- 1 to 15
    } yield ((if (src == "sA") 0L else 100L) + i, src,
      (1 to 40).map(t => s"$src-d$i-t$t").mkString(" "))
    val out = CorpusOps.kmvDistinct(docsDF(rows: _*), "source", 3, 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((src, (est, exact)) <- out) {
      assert(exact == 15L * 38, s"$src exact")
      val err = math.abs(est.toDouble / exact - 1.0)
      assert(err < 0.45, s"$src estimate $est vs exact $exact (err $err)")
    }
    // A group below k distinct shingles reports null estimate, exact count.
    val tiny = CorpusOps.kmvDistinct(
      docsDF((1L, "t", "a b c d")), "source", 3, 64).head()
    assert(tiny.isNullAt(1) && tiny.getLong(2) == 2L)
  }

  // ------------------------------------------------------- tfidfTopTerms

  test("tfidfTopTerms matches a brute-force integer TF-IDF") {
    val rows = Seq(
      (1L, "sA", "apple banana apple cherry"),
      (2L, "sA", "apple durian"),
      (3L, "sB", "banana banana fig"),
      (4L, "sB", "fig grape apple"))
    val df = docsDF(rows.map(r => (r._1, r._2, r._3)): _*)
    val got = CorpusOps.tfidfTopTerms(df, "doc_id", "source", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // Brute force: incidence of (doc, src, tok) with set semantics.
    val inc = rows.flatMap { case (id, s, t) => t.split(" ").distinct.map(tok => (id, s, tok)) }
    val dfq = inc.groupBy(_._3).map { case (t, xs) => t -> xs.size.toLong }
    val tfq = inc.groupBy(x => (x._2, x._3)).map { case (k, xs) => k -> xs.size.toLong }
    val expect = tfq.toSeq.map { case ((s, t), tf) => (s, t, tf * 1000000L / dfq(t)) }
      .groupBy(_._1).flatMap { case (_, xs) =>
        xs.sortBy(x => (-x._3, x._2)).zipWithIndex.take(2)
          .map { case ((s, t, sc), i) => (s, t, sc, i + 1L) }
      }.toSet
    assert(got == expect)
  }

  // ----------------------------------------------------------- spanStats

  test("spanStats counts instances and distinct cross-doc spans (incl. within-doc repeats)") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")         // one 8-token span
    val rows = Seq(
      // Docs 1 (sA) and 2 (sB) share `span` — cross-source duplication.
      (1L, "sA", span),
      (2L, "sB", span + " tail1 tail2"),
      // Doc 3 repeats its own unique span twice but shares with nobody.
      (3L, "sA", (1 to 8).map(i => s"u$i").mkString(" ") + " " + (1 to 8).map(i => s"u$i").mkString(" ")),
      // Doc 4: too short for any span.
      (4L, "sB", "short text"))
    val got = CorpusOps.spanStats(docsDF(rows: _*), "doc_id", "source", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // sA: doc1 has 1 span (dup with doc2); doc3 has 9 spans (16 tokens),
    // all unique to doc3 (the repeated one counts 2 instances, 1 distinct,
    // but only ONE document => not a dup span).
    assert(got("sA") == ((10L, 1L, 1L)), s"sA got ${got("sA")}")
    // sB: doc2 has 3 spans, one of which (the head) is the shared span.
    assert(got("sB") == ((3L, 1L, 1L)), s"sB got ${got("sB")}")
  }

  // -------------------------------------------------------- heavyHitters

  test("MgSketchAgg never misses a value with count > N/(cap+1)") {
    val agg = new CorpusOps.MgSketchAgg(4)
    // Skewed stream generator: values drawn from a small domain with a
    // heavy bias toward low indices.
    val gen = Gen.listOfN(80, Gen.frequency(
      (8, Gen.const("hh")), (3, Gen.const("mid")),
      (1, Gen.oneOf((1 to 12).map(i => s"r$i")))))
    forAll(gen, 60) { vs =>
      val split = vs.length / 3
      val (p1, rest) = vs.splitAt(split)
      val (p2, p3) = rest.splitAt(split)
      val sketch = agg.merge(agg.merge(
        p1.foldLeft(agg.zero)(agg.reduce),
        p2.foldLeft(agg.zero)(agg.reduce)),
        p3.foldLeft(agg.zero)(agg.reduce))
      assert(sketch.size <= 4)
      val counts = vs.groupBy(identity).view.mapValues(_.size).toMap
      val mustKeep = counts.filter(_._2 > vs.length / 5.0).keySet
      assert(mustKeep.subsetOf(agg.finish(sketch).toSet),
        s"missed heavy hitter: $mustKeep vs ${sketch.keySet} in $vs")
    }
  }

  test("heavyHitters returns exactly the values with cnt*(cap+1) > N, with exact counts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new scala.util.Random(5)
    // Zipf-ish: value v_i with weight ~ 1/(i+1) over 40 distinct values.
    val vals = (1 to 3000).map { _ =>
      val i = math.min((1.0 / (r.nextDouble() + 0.02)).toInt, 39)
      s"v$i"
    }
    val got = CorpusOps.heavyHitters(vals.toDF("tok").repartition(8), "tok", 10)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val counts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = counts.filter { case (_, c) => c * 11 > vals.length }
    assert(got == expect, s"got $got expect $expect")
  }

  // ------------------------------------------------------- decontaminate

  test("decontaminate flags train docs sharing spans with eval, counts distinct hits") {
    val leaked = (1 to 10).map(i => s"b$i").mkString(" ")   // 10 tokens => 3 8-spans
    val train = docsDF(
      (1L, "t", leaked + " extra tail"),                    // shares 3 eval spans
      (2L, "t", (1 to 12).map(i => s"c$i").mkString(" ")),  // clean
      (3L, "t", (3 to 10).map(i => s"b$i").mkString(" ") + " zz")) // shares 1 span
    val eval = docsDF((100L, "e", leaked), (101L, "e", "tiny"))
    val got = CorpusOps.decontaminate(train, eval, "doc_id", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // eval spans: b1..b8, b2..b9, b3..b10. Doc 1 (12 tokens) has 5 spans,
    // 3 of which are eval spans; doc 3's only eval span is b3..b10.
    assert(got == Map(1L -> 3L, 3L -> 1L), s"got $got")
  }

  // -------------------------------------------------------- discQuantiles

  test("discQuantiles matches a brute-force lower-discrete quantile") {
    val r = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val g = s"g${i % 3}"
      (i.toLong, g, "x " * (1 + r.nextInt(5)))  // text unused
    }
    val spark = TestSpark.spark
    import spark.implicits._
    val vals = rows.map { case (id, g, _) => (g, (id * 37 % 101)) }
    val df = vals.toDF("grp", "v")
    val qs = Seq(10, 50, 90, 100)
    val got = CorpusOps.discQuantiles(df, "grp", "v", qs)
      .collect().map(r => r.getString(0) -> qs.indices.map(i => r.getLong(i + 1))).toMap
    for ((g, xs) <- vals.groupBy(_._1)) {
      val sorted = xs.map(_._2).sorted
      val expect = qs.map { q =>
        sorted((math.ceil(q * sorted.length / 100.0) - 1).toInt.max(0)).toLong
      }
      assert(got(g) == expect, s"group $g: got ${got(g)} expect $expect")
    }
  }

  // ------------------------------------------------------- sourceOverlap

  test("sourceOverlap counts distinct shared spans per group pair, ordered") {
    val span1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val span2 = (1 to 8).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, "sA", span1 + " " + span2),      // sA holds both spans (+ overlap spans)
      (2L, "sB", span1),                    // shares span1 with sA
      (3L, "sC", span2 + " tail"),          // shares span2 with sA
      (4L, "sB", span1),                    // duplicate doc: distinct-per-group, no double count
      (5L, "sD", "u1 u2 u3 u4 u5 u6 u7 u8"))
    val got = CorpusOps.sourceOverlap(docsDF(rows: _*), "source", 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("sA", "sB") -> 1L, ("sA", "sC") -> 1L), s"got $got")
  }

  // ------------------------------------------------------ surprisalBands

  test("surprisalBands matches brute-force integer mean-surprisal banding") {
    val rows = Seq(
      (1L, "s", "the the the cat"),      // mostly hot tokens -> low band
      (2L, "s", "the the dog dog"),
      (3L, "s", "qqq zzz www yyy xxx"))  // all-rare doc -> high band
    val got = CorpusOps.surprisalBands(docsDF(rows: _*), "doc_id",
        scale = 1000L, bandDiv = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Brute force with the same integer arithmetic.
    val toks = rows.flatMap { case (id, _, t) => t.split(" ").map(id -> _) }
    val cnt = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = toks.size.toLong
    val expect = toks.groupBy(_._1).values.map { ts =>
      val score = ts.map { case (_, tok) => (1000L * total) / cnt(tok) }.sum
      (score / ts.size) / 100L
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("corpDrift matches brute-force smoothed frequency-ratio deciles") {
    val rows = Seq(
      (1L, "a", "x x x x y z"),
      (2L, "a", "x x y w w w"),
      (3L, "b", "x y y y z z"),
      (4L, "b", "q q q y z w"),
      (5L, "c", "ignored entirely"))
    val got = CorpusOps.corpDrift(docsDF(rows: _*), "source", "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    val toks = rows.filter(r => r._2 == "a" || r._2 == "b")
      .flatMap { case (_, g, t) => t.split(" ").map(g -> _) }
    val (as, bs) = (toks.filter(_._1 == "a").map(_._2), toks.filter(_._1 == "b").map(_._2))
    val vocab = (as ++ bs).distinct
    val expect = vocab.map { tok =>
      val fa = as.count(_ == tok).toLong * 1000000L / as.size
      val fb = bs.count(_ == tok).toLong * 1000000L / bs.size
      (((fa + 1) * 100) / (fb + 1)) / 10
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect, s"got $got expect $expect")
  }

  test("ksDrift matches the brute-force KS numerator; ties go to the smallest value") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Lengths with duplicates and interleaved ranges; group c and the null
    // metric row must be ignored.
    val rows: Seq[(String, java.lang.Long)] = Seq(
      "a" -> 10L, "a" -> 10L, "a" -> 20L, "a" -> 35L, "a" -> 50L,
      "b" -> 10L, "b" -> 25L, "b" -> 25L, "b" -> 60L,
      "c" -> 10L, "a" -> null)
    val df = rows.toDF("source", "len")
    val got = CorpusOps.ksDrift(df, "source", "len", "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val as = rows.filter(r => r._1 == "a" && r._2 != null).map(_._2.toLong)
    val bs = rows.filter(r => r._1 == "b" && r._2 != null).map(_._2.toLong)
    val gaps = (as ++ bs).distinct.sorted.map { v =>
      val gap = math.abs(as.count(_ <= v).toLong * bs.size - bs.count(_ <= v).toLong * as.size)
      (gap, v)
    }
    val best = gaps.maxBy { case (g, v) => (g, -v) }
    assert(got.toSeq == Seq((best._1, best._2, as.size.toLong, bs.size.toLong)),
      s"got ${got.toSeq} expect $best over $gaps")
    // Identical distributions -> gap 0, reported at the smallest value.
    val zero = CorpusOps.ksDrift(
      Seq(("a", 5L), ("b", 5L), ("a", 9L), ("b", 9L)).toDF("source", "len"),
      "source", "len", "a", "b").collect().head
    assert((zero.getLong(0), zero.getLong(1)) == (0L, 5L))
    // Empty slice pair -> zero rows, not a null row.
    assert(CorpusOps.ksDrift(df, "source", "len", "nope", "nada").collect().isEmpty)
  }

  test("bigramSurprisalBands matches brute force; common words in odd order score high") {
    val rows = Seq(
      (1L, "s", "the cat sat the cat sat the cat"), // repeated bigrams -> low
      (2L, "s", "cat the sat cat the sat"),         // same words, different order
      (3L, "s", "x"))                               // single token: no bigrams
    val got = CorpusOps.bigramSurprisalBands(docsDF(rows: _*), "doc_id",
        scale = 1000L, bandDiv = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    // Brute force with the same integer arithmetic.
    val bgs = rows.flatMap { case (id, _, t) =>
      val w = t.split(" ")
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(b => (id, b.mkString(" "), b(0))).toSeq
    }
    val cnt2 = bgs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cnt1 = bgs.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expect = bgs.groupBy(_._1).values.map { bs =>
      val score = bs.map { case (_, s, w1) => (1000L * cnt1(w1)) / cnt2(s) }.sum
      (score / bs.size) / 100L
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(!got.isEmpty && got.values.sum == 2L) // doc 3 absent (no bigrams)
  }

  // ----------------------------------------------------------- packStats

  test("packStats matches a sequential concat-and-chunk simulation; stable under repartition") {
    val r = new scala.util.Random(3)
    val rows = (1 to 120).map(i =>
      (i.toLong, "s", (1 to (1 + r.nextInt(40))).map(t => s"w$t").mkString(" ")))
    val df = docsDF(rows: _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusOps.packStats(d, "doc_id", 3, 50)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    val got = run(df)
    assert(got == run(df.repartition(7)), "packing changed under repartitioning")
    // Sequential oracle: md5-shuffle per shard, walk the token stream.
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def hv(c: Char) = if (c <= '9') c - '0' else c - 'a' + 10
    val expect = rows.map { case (id, _, text) =>
      val o = hex(s"pack:$id")
      (id, text.split(" ").length.toLong, o,
        (hv(o(28)) * 4096 + hv(o(29)) * 256 + hv(o(30)) * 16 + hv(o(31))) % 3)
    }.groupBy(_._4).toSeq.flatMap { case (shard, ds) =>
      var off = 0L
      ds.sortBy(d => (d._3, d._1)).map { d =>
        val bin = off / 50; off += d._2; (shard.toLong, bin) -> d._2
      }
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(got == expect, s"got $got expect $expect")
  }

  test("packStats two-level offsets equal the single-window formulation") {
    // The naive reference: ONE running-sum window per shard (the formulation
    // the two-level rewrite replaced — correct, but a single sort task per
    // shard at scale). Outputs must be identical bin-for-bin.
    import org.apache.spark.sql.expressions.Window
    val r = new scala.util.Random(11)
    val rows = (1 to 300).map(i =>
      (i.toLong, "s", (1 to (1 + r.nextInt(30))).map(t => s"w$t").mkString(" ")))
    val df = docsDF(rows: _*)
    val (nShards, budget) = (5, 64)
    def hexVal(h: org.apache.spark.sql.Column, j: Int) = {
      val a = ascii(substring(h, j, 1))
      a - when(a >= 97, 87).otherwise(48)
    }
    val ord = md5(concat(lit("pack:"), col("doc_id").cast("string")))
    val t = df.select(col("doc_id"),
        coalesce(size(TextOps.tokens(col("text"))), lit(0)).as("ntok"),
        ord.as("ord"))
      .withColumn("shard",
        (1 to 4).map(j => hexVal(col("ord"), 28 + j) * (1 << (4 * (4 - j))))
          .reduce(_ + _) % nShards)
    val w = Window.partitionBy("shard").orderBy("ord", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = t.withColumn("off", coalesce(sum(col("ntok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"off DIV $budget"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok_sum"))
      .collect().map(x => (x.getInt(0).toLong, x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    val got = CorpusOps.packStats(df, "doc_id", nShards, budget)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getLong(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got == naive, s"two-level packing diverged:\ngot $got\nnaive $naive")
  }

  // ---------------------------------------------------- stratifiedSample

  test("stratifiedSample: deterministic, partition-invariant, rate map honored") {
    val rows = (1 to 200).map(i =>
      (i.toLong, s"src${i % 4}", s"document number $i with body ${i * 31}"))
    val df = docsDF(rows: _*)
    val rates = Map("src0" -> 50, "src1" -> 0)
    val a = CorpusOps.stratifiedSample(df, "source", rates, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CorpusOps.stratifiedSample(df.repartition(7), "source", rates, 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "sample changed under repartitioning")
    val bySrc = rows.filter(r => a.contains(r._1)).groupBy(_._2).view.mapValues(_.size).toMap
    assert(!bySrc.contains("src1"), "rate-0 stratum leaked into the sample")
    assert(bySrc.getOrElse("src0", 0) > bySrc.getOrElse("src2", 0),
      s"50% stratum not larger than 10% stratum: $bySrc")
    // Sampling a union == union of samples (content-keyed, not RNG-keyed).
    val (h1, h2) = rows.splitAt(120)
    val u = CorpusOps.stratifiedSample(docsDF(h1: _*), "source", rates, 10)
      .unionAll(CorpusOps.stratifiedSample(docsDF(h2: _*), "source", rates, 10))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(u == a, "sample of union != union of samples")
    // 100% keeps everything.
    assert(CorpusOps.stratifiedSample(df, "source", Map.empty, 100).count() == 200)
  }

  test("groupTopK: exactly k per stratum (fewer if small), matches brute-force hash order") {
    val rows = (1 to 60).map(i =>
      (i.toLong, s"src${i % 3}", s"document body $i ${i * 13}")) ++
      Seq((100L, "tiny", "lone doc"))
    val df = docsDF(rows: _*)
    val got = CorpusOps.groupTopK(df, "doc_id", "source", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Brute force: per source, the 5 smallest (md5("topk:"+text), doc_id).
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map(d => (hex("topk:" + d._3), d._1))
        .sorted.take(5).zipWithIndex
        .map { case ((_, id), i) => (src, id, (i + 1).toLong) }
    }.toSet
    assert(got.toSet == expect, s"got ${got.toSet}\nexpect $expect")
    assert(got.count(_._1 == "tiny") == 1) // small stratum: all of it, rank 1
    // Partition-invariant (content-keyed, not RNG-keyed).
    val re = CorpusOps.groupTopK(df.repartition(7), "doc_id", "source", 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(re == got.toSet, "sample changed under repartitioning")
  }

  test("corpus ops are well-behaved on empty and null-text input") {
    val empty = docsDF()
    assert(CorpusOps.tfidfTopTerms(empty, "doc_id", "source", 5).count() == 0)
    assert(CorpusOps.kmvDistinct(empty, "source", 3, 64).count() == 0)
    assert(CorpusOps.spanStats(empty, "doc_id", "source", 8).count() == 0)
    assert(CorpusOps.heavyHitters(empty.select(col("text").as("v")), "v", 8).count() == 0)
    assert(CorpusOps.discQuantiles(empty, "source", "doc_id", Seq(50)).count() == 0)
    assert(CorpusOps.packStats(empty, "doc_id", 4, 100).count() == 0)
    assert(CorpusOps.decontaminate(empty, empty, "doc_id", 8).count() == 0)
    // Null text: absent from token/span paths, packed with 0 tokens.
    val nulls = docsDF((1L, "s", null), (2L, "s", "a b c d e f g h i"))
    assert(CorpusOps.spanStats(nulls, "doc_id", "source", 8)
      .head().getLong(1) == 2L) // only doc 2's spans
    val packed = CorpusOps.packStats(nulls, "doc_id", 1, 100)
      .collect().map(r => r.getLong(2) -> r.getLong(3))
    assert(packed.toSeq == Seq(2L -> 9L), // both docs packed, null counts 0 tokens
      s"got ${packed.toSeq}")
  }

  test("prioritySample matches a driver-side replay; deterministic under repartition") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"doc number $i with ${"x " * (i % 13).toInt}payload"))
      .map { case (i, t) => (i, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    // Driver-side replay: same md5, same base-31 ascii fold over the first
    // six hex chars, same w/h priority, same (prio desc, id) order.
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(text: String): Long = {
      val hex = md.digest(("prio:" + text).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.take(6).foldLeft(0L)((a, c) => a * 31L + c.toInt)
    }
    val expect = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map { case (id, t, w) => (id, w, w.toDouble / draw(t).toDouble) }
      .sortBy { case (id, _, p) => (-p, id) }
      .take(10).map { case (id, w, _) => (id, w) }.toSeq
    def got(df: org.apache.spark.sql.DataFrame) =
      CorpusOps.prioritySample(df, "doc_id", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got(docs) == expect.sorted)
    assert(got(docs.repartition(13)) == expect.sorted)
    // k beyond the corpus: everything is sampled.
    assert(CorpusOps.prioritySample(docs, "doc_id", 1000).count() == 60L)
  }

  test("hllRegisters: union-mergeable — re-max of parts equals the whole") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1 to 40).map(i =>
      (i.toLong, (1 to 12).map(j => s"w${(i * 7 + j * 3) % 19}").mkString(" "),
        if (i <= 20) "p1" else "p2")).toDF("doc_id", "text", "part")
    // Whole-corpus sketch under one group label...
    val whole = CorpusOps.hllRegisters(docs.withColumn("g", lit("all")), "g", 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // ...must equal the per-part sketches merged by register max.
    val merged = CorpusOps.hllRegisters(docs, "part", 3)
      .groupBy("reg").agg(max("max_rho").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(whole == merged)
    assert(whole.values.forall(r => r >= 1L && r <= 49L))
  }

  test("hllRegisters: identical corpora produce identical registers (set semantics)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = (1 to 15).map(i => (i.toLong, s"a b c d${i % 5} e f", "g1"))
    val doubled = base ++ base.map { case (id, t, _) => (id + 100L, t, "g2") }
    val regs = CorpusOps.hllRegisters(
        doubled.toDF("doc_id", "text", "g"), "g", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val g1 = regs.filter(_._1 == "g1").map(t => (t._2, t._3)).toSet
    val g2 = regs.filter(_._1 == "g2").map(t => (t._2, t._3)).toSet
    assert(g1 == g2 && g1.nonEmpty)
  }

  test("stratifiedSample uses a salted bucket (not the split bucket)") {
    val spark = TestSpark.spark
    val df = docsDF((1 to 100).map(i =>
      (i.toLong, "s", s"text body $i ${i * 17}")): _*)
    val unsalted = df.select(
      graft.operators.TextOps.hashBucketCol(col("text")).as("b")).collect().map(_.getInt(0))
    val salted = df.select(
      CorpusOps.sampleBucketCol(col("text"), "sample:").as("b")).collect().map(_.getInt(0))
    assert(unsalted.toSeq != salted.toSeq, "sample bucket must differ from split bucket")
  }

  // ------------------------------------------------------ count-min sketch

  /** The operator's exact bucket recipe in sequential Scala: 16 bits of
    * the salted md5 (hex chars 29–32) mod width. */
  private def refCmsBucket(t: String, r: Int, width: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hx = d.digest(s"cms$r:$t".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    Integer.parseInt(hx.substring(28, 32), 16) % width
  }

  test("cmSketch: cell count bounded by depth x width; total mass = depth x occurrences") {
    val rnd = new scala.util.Random(23)
    val docs = docsDF((1 to 40).map(i =>
      (i.toLong, "s", (1 to 20).map(_ => s"w${rnd.nextInt(30)}").mkString(" "))): _*)
    val cells = CorpusOps.cmSketch(docs, 3, 16).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(cells.length <= 3 * 16)
    assert(cells.forall { case (r, b, _) => r >= 0 && r < 3 && b >= 0 && b < 16 })
    assert(cells.filter(_._1 == 0).map(_._3).sum == 40L * 20L)
    assert(cells.map(_._3).sum == 3L * 40L * 20L)
  }

  test("cmsHeavyEstimates matches a sequential sketch replay; estimates dominate truth") {
    val rnd = new scala.util.Random(29)
    // Skewed vocabulary over a deliberately tiny width so collisions occur.
    val docs = docsDF((1 to 60).map(i =>
      (i.toLong, "s",
        (1 to 15).map(_ => s"tok${(math.pow(rnd.nextDouble(), 2) * 40).toInt}")
          .mkString(" "))): _*)
    val (depth, width, k) = (3, 16, 10)
    val got = CorpusOps.cmsHeavyEstimates(docs, depth, width, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // Sequential replay.
    val toks = docs.collect().flatMap(_.getString(2).split(" ", -1))
    val cnt = toks.groupBy(identity).map { case (t, ts) => t -> ts.size.toLong }
    val cells = (0 until depth).map { r =>
      toks.groupBy(t => refCmsBucket(t, r, width))
        .map { case (b, ts) => b -> ts.size.toLong }
    }
    val probe = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    val ref = probe.map { case (t, c) =>
      (t, c, (0 until depth).map(r => cells(r)(refCmsBucket(t, r, width))).min)
    }.toSet
    assert(got.toSet == ref)
    assert(got.forall { case (_, tru, est) => est >= tru })
  }

  test("cmsHeavyEstimates is exact when the sketch is collision-free") {
    // 4 distinct tokens into a 64-bucket sketch: no collisions (verified
    // by the replayed buckets), so every estimate equals the true count.
    val docs = docsDF(
      (1L, "s", "a a a b"), (2L, "s", "b c d a"), (3L, "s", "a b c c"))
    val got = CorpusOps.cmsHeavyEstimates(docs, 3, 64, 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val buckets = Seq("a", "b", "c", "d")
      .map(t => (0 until 3).map(r => refCmsBucket(t, r, 64)))
    assert((0 until 3).forall(r => buckets.map(_(r)).distinct.size == 4),
      "fixture must be collision-free; pick different tokens")
    assert(got.forall { case (_, tru, est) => est == tru })
    assert(got.map(_._1).toSet == Set("a", "b", "c", "d"))
  }

  test("tokenBudgetAlloc: hand-computed Hamilton apportionment, sum equals the budget") {
    // Token masses a=5, b=3, c=2 (T=10), budget 7: floors 3/2/1 (Σ 6),
    // remainders 5/1/4 → the 1 leftover goes to a → 4/2/1.
    val docs = docsDF(
      (1L, "a", "t1 t2 t3"), (2L, "a", "t4 t5"),
      (3L, "b", "t1 t2 t3"), (4L, "c", "t1  t2")) // double space drops a token
    val got = CorpusOps.tokenBudgetAlloc(docs, "source", 7L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((5L, 4L)), "b" -> ((3L, 2L)), "c" -> ((2L, 1L))))
    // Budget == corpus total → every group gets exactly its mass.
    val full = CorpusOps.tokenBudgetAlloc(docs, "source", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(full == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("tokenBudgetAlloc: Σ alloc == budget for arbitrary masses (largest-remainder invariant)") {
    val rnd = new scala.util.Random(29)
    val docs = docsDF((1L to 40L).map(i =>
      (i, s"g${rnd.nextInt(7)}",
        Seq.fill(1 + rnd.nextInt(9))("w").mkString(" "))): _*)
    for (budget <- Seq(0L, 1L, 17L, 100L, 1000L)) {
      val alloc = CorpusOps.tokenBudgetAlloc(docs, "source", budget)
        .collect().map(_.getLong(2))
      assert(alloc.sum == budget, s"budget $budget")
      assert(alloc.forall(_ >= 0))
    }
  }

  // ------------------------------------------------------- collocations

  test("liftPairs: brute-force doc-level lift with both support floors") {
    val rnd = new scala.util.Random(41)
    // 'x y' planted together in exactly one third of the docs (and
    // nowhere else): lift = N/df = 3.0, far above filler coincidences.
    val rows = (1L to 30L).map { i =>
      val planted = if (i % 3 == 0) "x y " else ""
      (i, "s", s"$planted" +
        s"f${rnd.nextInt(6)} f${rnd.nextInt(6)} f${rnd.nextInt(6)}")
    }
    val (minDf, minPair) = (5L, 3L)
    val got = CorpusOps.liftPairs(docsDF(rows: _*), "doc_id", minDf, minPair)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    graft.core.Caches.releaseAll()
    // Sequential reference.
    val inc = rows.flatMap { case (id, _, text) =>
      text.split(" ", -1).distinct.map(t => (id, t)) }
    val nd = rows.map(_._1).distinct.size.toLong
    val dfm = inc.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
      .filter(_._2 >= minDf)
    val byDoc = inc.filter(x => dfm.contains(x._2)).groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).sorted }
    val ref = byDoc.toSeq
      .flatMap(ts => for (i <- ts.indices; j <- (i + 1) until ts.length)
        yield (ts(i), ts(j)))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= minPair)
      .map { case ((a, b), nab) =>
        (a, b) -> (nab, dfm(a), dfm(b), 1000L * nab * nd / (dfm(a) * dfm(b))) }
    assert(got == ref)
    // The planted pair carries the highest lift.
    val top = got.toSeq.maxBy { case (_, (_, _, _, l)) => l }._1
    assert(top == ("x", "y"), s"planted collocation must top the lift: $got")
  }

  // --------------------------------------------------- importance scores

  /** The operator's bucket recipe sequentially (md5 hex 29–32 mod buckets,
    * salt "dsir:"). */
  private def refDsirBucket(t: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hx = d.digest(s"dsir:$t".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    Integer.parseInt(hx.substring(28, 32), 16) % buckets
  }

  /** Sequential DSIR reference: smoothed bucket counts, bit-length logs,
    * summed per-doc log-ratio. */
  private def refDsir(rows: Seq[(Long, String, String)], target: String,
                      buckets: Int, scale: Long): Map[Long, (Long, Long)] = {
    def log2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val toks = rows.map { case (id, src, text) =>
      (id, src, text.split(" ", -1).map(refDsirBucket(_, buckets))) }
    val tc = new Array[Long](buckets); val rc = new Array[Long](buckets)
    toks.foreach { case (_, src, bs) =>
      bs.foreach(b => if (src == target) tc(b) += 1 else rc(b) += 1) }
    val (tt, rt) = (tc.sum, rc.sum)
    def tbits(b: Int) = log2((tt + buckets) * scale / (tc(b) + 1))
    def rbits(b: Int) = log2((rt + buckets) * scale / (rc(b) + 1))
    toks.map { case (id, _, bs) =>
      id -> (bs.length.toLong, bs.map(b => rbits(b) - tbits(b)).sum)
    }.toMap
  }

  test("importanceScores: matches the sequential reference; target-vocab docs rank above raw-vocab docs") {
    val rnd = new scala.util.Random(31)
    // Target docs speak 'curated' vocabulary; raw docs mostly 'web'
    // vocabulary; one raw doc written in curated words must outscore its
    // web-vocabulary siblings.
    def words(prefix: String, n: Int) =
      (1 to 12).map(_ => s"$prefix${rnd.nextInt(n)}").mkString(" ")
    val rows = (1L to 6L).map(i => (i, "tgt", words("cur", 8))) ++
      (7L to 14L).map(i => (i, "web", words("w", 30))) :+
      (15L, "web", words("cur", 8))
    val got = CorpusOps.importanceScores(
        docsDF(rows: _*), "doc_id", "source", col("source") === "tgt", 64, 65536L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got == refDsir(rows, "tgt", 64, 65536L))
    val webScores = (7L to 14L).map(got(_)._2)
    assert(webScores.forall(_ < got(15L)._2),
      s"curated-vocabulary raw doc must outscore web docs: ${got(15L)._2} vs $webScores")
  }

  test("shuffleRank: exact permutation, partitioning-invariant, salt-sensitive") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.range(0, 300).select(col("id").as("doc_id"))
    def ranks(d: org.apache.spark.sql.DataFrame, salt: String): Map[Long, Long] =
      CorpusOps.shuffleRank(d, "doc_id", salt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = ranks(df, "s1:")
    // A true permutation: ranks are exactly 0..n-1, each once.
    assert(r1.values.toSeq.sorted == (0L until 300L).toList)
    // Pure function of (salt, id): any physical partitioning yields the
    // identical order (the reproducible-training-order contract).
    assert(ranks(df.repartition(7), "s1:") == r1)
    assert(ranks(df.orderBy(col("doc_id").desc).coalesce(1), "s1:") == r1)
    // A different salt is a different permutation (overwhelmingly).
    assert(ranks(df, "s2:") != r1)
    // And the order is actually shuffled, not identity-ish: some doc's
    // rank differs from its id.
    assert(r1.exists { case (id, rk) => id != rk })
  }
}
