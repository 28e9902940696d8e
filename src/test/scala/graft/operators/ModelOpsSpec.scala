package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

class ModelOpsSpec extends AnyFunSuite {

  /** Documents where n_tok ≥ 4 ⟺ over-budget (n_chars ≥ 300): the stump
    * on n_tok separates perfectly at θ = 4; the other features are
    * constant-ish and cannot do better than the class prior. */
  private def docsDf() = {
    val spark = TestSpark.spark
    import spark.implicits._
    Seq(
      (1L, "aa bb", 100L), (2L, "cc dd", 120L), (3L, "ee ff gg", 250L),
      (4L, "aa bb cc dd", 350L), (5L, "aa bb cc dd ee", 400L),
      (6L, "aa bb cc dd ee ff", 500L)
    ).toDF("doc_id", "text", "n_chars")
  }

  test("stumpTrain finds the perfect separator and exact error counts") {
    val rows = ModelOps.stumpTrain(docsDf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // n_tok: thresholds swept over {2, 3, 4, 5, 6}; θ=4 → 0 errors.
    assert(rows.contains(("n_tok", 4L, 0L)), s"got $rows")
    // Every feature reports at most the minority-class error count (the
    // sweep can always do at least as well as predicting the majority —
    // here 3/3, and the all-(-1) rule is reachable only when some value
    // sits above every positive, so ≤ 3 holds as a sanity bound).
    assert(rows.forall(_._3 <= 3L), s"got $rows")
    assert(rows.map(_._1) == Set("n_tok", "n_long", "n_stop"))
  }

  test("stumpTrain error counts match a brute-force sweep") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = docsDf()
    val feats = df.select(
      when(col("n_chars") >= ModelOps.CharBudget, 1L).otherwise(-1L).as("y"),
      size(split(col("text"), " ")).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val best = feats.map(_._2).distinct.map { thr =>
      val errs = feats.count { case (y, v) =>
        (v >= thr && y == -1L) || (v < thr && y == 1L) }
      (thr, errs.toLong)
    }.minBy { case (t, e) => (e, t) }
    val got = ModelOps.stumpTrain(df).filter(col("feature") === "n_tok")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == best)
  }

  test("stumpConfusion cells cover the corpus and match the best stump") {
    val cells = ModelOps.stumpConfusion(docsDf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(cells.values.sum == 6L)
    // Perfect separator: only the diagonal cells exist.
    assert(cells.keySet == Set((1L, 1L), (-1L, -1L)), s"got $cells")
    assert(cells((1L, 1L)) == 3L && cells((-1L, -1L)) == 3L)
  }

  test("ties at equal error counts break toward the smallest threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Single positive doc: every θ ≤ its n_tok yields 0 errors; the sweep
    // must pick the smallest distinct value as θ.
    val one = Seq((1L, "aa bb cc", 400L)).toDF("doc_id", "text", "n_chars")
    val got = ModelOps.stumpTrain(one).filter(col("feature") === "n_tok")
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(got == ((3L, 0L)))
  }

  test("perceptronTrain: hand-computed trajectory converges on separable data") {
    val spark = TestSpark.spark
    import spark.implicits._
    // y = +1 iff f1 = 1. Batch rounds: (w1,b,n_upd) =
    // r1: sign(0)=-1 → 3 positives misclassified → (3, 3, 3)
    // r2: f1=0 rows score b=3>0 → 2 negatives wrong → (3, 1, 2)
    // r3: f1=0 rows score 1>0 → still wrong      → (3, -1, 2)
    // r4: margins 2 / -1 → all correct            → (3, -1, 0)
    val feats = (Seq.fill(3)((1L, 1L)) ++ Seq.fill(2)((0L, -1L)))
      .toDF("f1", "y")
    val got = ModelOps.perceptronTrain(feats, Seq("f1"), "y", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 3L), (2L, 3L, 1L, 2L),
      (3L, 3L, -1L, 2L), (4L, 3L, -1L, 0L)))
  }

  test("perceptronTrain is partition-invariant (batch updates, not sequential)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 80).map { i =>
      (i.toLong % 2, (i * 7 % 5).toLong, if (i % 3 == 0) 1L else -1L)
    }
    val a = ModelOps.perceptronTrain(
      rows.toDF("f1", "f2", "y").repartition(1), Seq("f1", "f2"), "y", 3)
      .collect().toSeq
    val b = ModelOps.perceptronTrain(
      rows.reverse.toDF("f1", "f2", "y").repartition(7), Seq("f1", "f2"), "y", 3)
      .collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  // ---------------------------------------------------------- naive Bayes

  /** Reference replay of the quantized-log2 NB (the operator's exact
    * recursion, sequential Scala): Laplace-smoothed bit weights, bit-length
    * floor-log2, argmin with class-asc tie-break. */
  private def refNb(docs: Seq[(Long, String, String)]): Map[(String, String), Long] = {
    def qlog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val toks = docs.flatMap { case (id, text, cls) =>
      Option(text).getOrElse("").split(" ", -1).map(t => (id, cls, t)) }
    val vocab = toks.map(_._3).distinct
    val v = vocab.size.toLong
    val classes = docs.map(_._3).distinct.sorted
    val tc = toks.groupBy(_._2).map { case (c, ts) => c -> ts.size.toLong }
    val cnt = toks.groupBy(t => (t._2, t._3)).map { case (k, ts) => k -> ts.size.toLong }
    val nc = docs.groupBy(_._3).map { case (c, ds) => c -> ds.size.toLong }
    val n = docs.size.toLong
    val pri = classes.map(c => c -> qlog2((n * ModelOps.NbScale) / nc(c))).toMap
    val pred = docs.map { case (id, text, cls) =>
      val ts = Option(text).getOrElse("").split(" ", -1).toSeq
      val best = classes.map { c =>
        val s = ts.map { t =>
          qlog2(((tc(c) + v) * ModelOps.NbScale) / (cnt.getOrElse((c, t), 0L) + 1L))
        }.sum + pri(c)
        (s, c)
      }.min
      (cls, best._2)
    }
    pred.groupBy(identity).map { case (k, ps) => k -> ps.size.toLong }
  }

  private def nbDocs = Seq(
    // Two separable "languages" + one doc of mixed vocabulary.
    (1L, "der hund ist gut", "de"), (2L, "der gute hund", "de"),
    (3L, "ist der hund da", "de"),
    (4L, "the dog is good", "en"), (5L, "the good dog", "en"),
    (6L, "is the dog here", "en"), (7L, "the dog der hund", "en"))

  test("nbConfusion matches the sequential reference replay") {
    val spark = TestSpark.spark
    import spark.implicits._
    val got = ModelOps.nbConfusion(nbDocs.toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    graft.core.Caches.releaseAll()
    assert(got == refNb(nbDocs))
    // Sanity: the separable majority classifies correctly.
    assert(got.getOrElse(("de", "de"), 0L) == 3L)
    assert(got.getOrElse(("en", "en"), 0L) >= 3L)
  }

  test("nbConfusion is partition-invariant and null-text-safe") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = nbDocs :+ (8L, null.asInstanceOf[String], "en")
    val a = ModelOps.nbConfusion(docs.toDF("doc_id", "text", "lang").repartition(1))
      .collect().map(_.toSeq).toSet
    graft.core.Caches.releaseAll()
    val b = ModelOps.nbConfusion(
        docs.reverse.toDF("doc_id", "text", "lang").repartition(5))
      .collect().map(_.toSeq).toSet
    graft.core.Caches.releaseAll()
    assert(a == b)
    assert(a == refNb(docs).map { case ((ac, pr), n) => Seq(ac, pr, n) }.toSet)
  }
}
