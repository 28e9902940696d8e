package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based curation: training and applying cheap routing/filtering
  * classifiers over integer text features — the "model in the loop" step
  * of a training-data pipeline.
  *
  * The trainer is a DECISION STUMP (1R) learner: for each candidate
  * feature it finds the error-minimizing threshold rule
  * `pred = +1 iff x ≥ θ` by exact counting, then the best feature wins —
  * the classic weak learner (the unit AdaBoost boosts). Unlike a
  * constant-step batch perceptron (which oscillates on correlated
  * integer features), stump training is single-pass, deterministic, and
  * finds the GLOBAL optimum per feature by construction, so the learned
  * rule is reproducible and engine-replayable: everything is integer
  * counting, and the SQL oracle re-trains the identical model.
  *
  * The demo task is LENGTH ROUTING — predict whether a document exceeds
  * the char budget ([[CharBudget]], the near-median split of the test
  * corpus) from token-level features (token count, long-word count,
  * stopword hits): the cheap router a packing/chunking pipeline applies
  * before paying for exact measurement.
  *
  * Scale shape: one corpus scan melts (feature, value, label) triples
  * into partial-aggregated counts — the shuffled table is bounded by
  * features × distinct values, NOT corpus rows; the threshold sweep is a
  * cumulative-sum window over each feature's distinct-value list (a few
  * hundred rows per feature). No training loop, no driver-side data, no
  * per-row UDFs.
  */
object ModelOps {

  /** The label's char budget. */
  private[graft] val CharBudget = 300L

  /** Long-word cutoff for the `n_long` feature. */
  private[graft] val LongWordLen = 6

  /** Feature names in stack order — shared with the SQL oracle. */
  private[graft] val FeatureNames = Seq("n_tok", "n_long", "n_stop")

  /** Integer features (token count, long-word count, en-stopword hits) +
    * the ±1 over-budget label. One scan, pure column arithmetic,
    * codegen-friendly. */
  private def features(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      when(col("n_chars") >= CharBudget, 1L).otherwise(-1L).as("y"),
      size(toks).cast("long").as("n_tok"),
      size(filter(toks, t => length(t) >= LongWordLen))
        .cast("long").as("n_long"),
      TextOps.hitCount(toks, TextOps.LangProfiles.head._2)
        .cast("long").as("n_stop"))
  }

  /** Per-(feature, threshold) exact error counts: for the rule
    * `pred = +1 iff x ≥ θ` over candidate thresholds θ = the feature's
    * observed distinct values,
    *
    *   errors(θ) = #{y=+1, x < θ} + #{y=−1, x ≥ θ}
    *
    * via cumulative sums over the per-feature distinct-value list. */
  private def stumpErrors(docs: DataFrame): DataFrame = {
    val stackExpr = FeatureNames
      .map(f => s"'$f', $f").mkString(s"stack(${FeatureNames.size}, ", ", ", ")")
    val melted = features(docs)
      .select(col("y"), expr(s"$stackExpr AS (feature, v)"))
    val g = melted.groupBy("feature", "v").agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
      sum(when(col("y") === -1L, 1L).otherwise(0L)).as("nn"))
    val below = Window.partitionBy("feature").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy("feature")
    g.select(col("feature"), col("v").as("thr"),
      (coalesce(sum(col("np")).over(below), lit(0L)) +
        sum(col("nn")).over(whole) -
        coalesce(sum(col("nn")).over(below), lit(0L))).as("errs"))
  }

  /** The trained model: per feature, the error-minimizing threshold
    * (ties → smallest θ). Output: (feature, thr, errs) — one row per
    * candidate feature; the best row IS the 1R model, and hashing all
    * rows pins the full per-feature sweep, not just the winner. */
  def stumpTrain(docs: DataFrame): DataFrame = {
    val rank = Window.partitionBy("feature")
      .orderBy(col("errs"), col("thr"))
    stumpErrors(docs)
      .withColumn("rn", row_number().over(rank))
      .filter(col("rn") === 1)
      .select(col("feature"), col("thr"), col("errs"))
  }

  /** Confusion matrix of the overall-best stump over the corpus
    * (label ±1 × prediction ±1 cell counts). Train = one aggregate; the
    * winning (feature, θ) — a two-value model — enters the scoring scan
    * as literals, same deploy shape as the k-means/PQ model gates. */
  def stumpConfusion(docs: DataFrame): DataFrame = {
    val best = stumpTrain(docs)
      .orderBy(col("errs"), col("feature"), col("thr"))
      .limit(1).collect()(0)
    val (feat, thr) = (best.getString(0), best.getLong(1))
    features(docs)
      .select(col("y"),
        when(col(feat) >= thr, 1L).otherwise(-1L).as("pred"))
      .groupBy("y", "pred").agg(count(lit(1)).as("n"))
  }

  /** BATCH perceptron training over integer features — the iterative
    * supervised twin of the k-means loop (bounded rounds × one
    * partial-aggregated scan per round; model state lives on the driver
    * and enters each scan as literals): per round, sum the
    * misclassified rows' `y·x` contributions in ONE aggregate and apply
    * them as a single batch update (never per-row sequential updates —
    * those are order-dependent and undistributable).
    *
    * The batch variant need not converge on non-separable data (the
    * oscillation noted on [[stumpTrain]]); rounds are therefore FIXED
    * and the gated artifact is the whole deterministic TRAJECTORY —
    * per-round weights, bias, and the update's misclassified count —
    * which doubles as the training-quality readout (n_upd falling =
    * learning; flat = capacity reached). Integer end-to-end; the oracle
    * replays every round. sign(0) = −1 (an untrained all-zero model
    * predicts the negative class).
    *
    * Output: (round 1..rounds, one weight column per feature, b, n_upd)
    * where the weights/bias are AFTER the round's update and n_upd is
    * the misclassified count BEFORE it. */
  def perceptronTrain(feats: DataFrame, featCols: Seq[String],
                      labelCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds must be in 1..64: $rounds")
    val spark = feats.sparkSession
    val k = featCols.length
    val w = Array.fill(k)(0L)
    var b = 0L
    val traj = Seq.newBuilder[(Int, Seq[Long], Long, Long)]
    for (t <- 1 to rounds) {
      val margin = featCols.zipWithIndex
        .map { case (c, i) => col(c) * lit(w(i)) }
        .reduceOption(_ + _).getOrElse(lit(0L)) + lit(b)
      val mis = when(margin > 0, 1L).otherwise(-1L) =!= col(labelCol)
      val aggs = featCols.map(c =>
        sum(when(mis, col(labelCol) * col(c)).otherwise(0L))) ++ Seq(
        sum(when(mis, col(labelCol)).otherwise(0L)),
        sum(when(mis, 1L).otherwise(0L)))
      val r = feats.agg(aggs.head, aggs.tail: _*).collect()(0)
      def at(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      (0 until k).foreach(i => w(i) += at(i))
      b += at(k)
      traj += ((t, w.toSeq, b, at(k + 1)))
    }
    import spark.implicits._
    traj.result()
      .map { case (t, ws, bb, n) => (t.toLong, ws, bb, n) }
      .toDF("round", "ws", "b", "n_upd")
      .select(Seq(col("round")) ++
        featCols.indices.map(i => element_at(col("ws"), i + 1).as(s"w${i + 1}")) ++
        Seq(col("b"), col("n_upd")): _*)
  }

  /** Fixed-point surprisal scale of the naive-Bayes scorer (2¹⁶ — the
    * quotient keeps ~16 fractional bits before quantization). */
  private[graft] val NbScale = 65536L

  /** ⌊log₂ x⌋ for a positive integer column — ENGINE-NEUTRAL quantized
    * logarithm: the bit length of x (`length(bin(x)) − 1`; both Spark and
    * DuckDB print BIGINT binary without leading zeros). This is what makes
    * an additive log-likelihood model replayable: float `ln` differs in
    * the last ulp across engines, bit length never does. */
  private def qlog2(x: Column): Column =
    (length(bin(x)) - 1).cast("long")

  /** MULTINOMIAL NAIVE BAYES language classifier, trained and evaluated on
    * the corpus itself (the learned upgrade of the profile-heuristic
    * [[TextOps]] lang-id): per-class Laplace-smoothed token likelihoods,
    * scored in QUANTIZED log space —
    *
    *   w(t,c)  = ⌊log₂( (Tc + V)·2¹⁶ div (cnt(t,c) + 1) )⌋   (token surprisal, bits)
    *   prior(c)= ⌊log₂( (N·2¹⁶) div Nc )⌋
    *   predict(d) = argmin_c prior(c) + Σ_{t ∈ d} w(t,c)      (ties → class asc)
    *
    * with Tc = class token total, V = corpus vocabulary size, cnt the
    * class-token count, N/Nc doc counts. Quantizing log₂ to whole bits
    * ([[qlog2]]) costs < 1 bit per token against exact NB scores but
    * makes training AND scoring integer-exact end to end, so the SQL
    * oracle replays the full model — the same determinism trade as the
    * int8 k-means trainer ([[graft.operators.VectorOps.kmeansAssign]]).
    *
    * Output: the self-evaluation confusion matrix (actual, predicted, n)
    * — hashing it pins training counts, every smoothed weight, and every
    * doc's argmin.
    *
    * Scale shape: training is two partial-aggregated token-scan groupBys
    * (class-token counts + class totals); the weight table is
    * vocabulary × classes rows — MODEL-sized, not corpus-sized — and
    * scoring is one equi-join of the token stream to it on the token key
    * (AQE broadcasts it while it fits; the Σ partial-aggregates
    * map-side on (doc, class) before the shuffle). No driver-side data,
    * no per-row UDFs, no training loop. */
  def nbConfusion(docs: DataFrame, idCol: String = "doc_id",
                  classCol: String = "lang"): DataFrame = {
    val toks = graft.core.Caches.persistTracked(
      docs.select(col(idCol).as("id"), col(classCol).as("cls"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("t")))
    val vocabSize = toks.agg(countDistinct(col("t")).as("vsz"))
    val classTok = toks.groupBy("cls").agg(count(lit(1)).as("tc"))
    val tokCls = toks.groupBy("cls", "t").agg(count(lit(1)).as("cnt"))
    val weights =
      toks.select("t").distinct()
        .crossJoin(broadcast(classTok.crossJoin(vocabSize)))
        .join(tokCls, Seq("cls", "t"), "left")
        .withColumn("num", (col("tc") + col("vsz")) * lit(NbScale))
        .withColumn("den", coalesce(col("cnt"), lit(0L)) + lit(1L))
        .select(col("cls"), col("t"), qlog2(expr("num div den")).as("wbits"))
    val priors = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("nc"))
      .crossJoin(docs.agg(count(lit(1)).as("n")))
      .withColumn("pnum", col("n") * lit(NbScale))
      .select(col("cls"), qlog2(expr("pnum div nc")).as("pbits"))
    val scores = toks
      .select(col("id"), col("t"))
      .join(weights.withColumnRenamed("cls", "cand"), "t")
      .groupBy("id", "cand").agg(sum("wbits").as("sbits"))
      .join(broadcast(priors.select(col("cls").as("cand"), col("pbits"))), "cand")
      .select(col("id"), col("cand"), (col("sbits") + col("pbits")).as("score"))
    val predicted = scores
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("score"), col("cand"))))
      .filter(col("rn") === 1)
      .select(col("id"), col("cand").as("predicted"))
    docs.select(col(idCol).as("id"), col(classCol).as("actual"))
      .join(predicted, "id")
      .groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
  }
}
