package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge-table training — the
  * vocabulary-construction step of an LLM data pipeline (Sennrich, Haddow,
  * Birch — "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016): start from characters, repeatedly merge the most frequent
  * adjacent symbol pair, and emit the learned merge table in order.
  *
  * Conventions (deterministic, engine-replayable):
  *   - pair counts are per-word adjacent-pair occurrences × word frequency,
  *     OVERLAPPING occurrences counted ("aaa" contributes (a,a) twice) —
  *     the reference implementation's counting;
  *   - the winning pair is (count desc, left asc, right asc);
  *   - application is greedy left-to-right NON-overlapping ("aaa" merges to
  *     ("aa", "a")).
  *
  * Scale shape — the production trainer split (sample-train / distributed-
  * apply), not a per-merge job loop: the corpus is scanned ONCE into the
  * distinct-word frequency table (map-side combined); TRAINING runs on the
  * driver over a bounded deterministic sample of that table — the
  * `sampleCap` most frequent words (freq desc, word asc) — with
  * incrementally-maintained pair counts, so a 32k–100k-merge vocabulary is
  * one in-memory loop instead of 32k+ sequential Spark jobs; APPLICATION of
  * the whole trained table is then ONE distributed pass over the
  * vocabulary-sized word table (every merge applied per word in rank
  * order). Driver state is bounded by `sampleCap` × word length, the same
  * model-sized-state contract as [[VectorOps.kmeansAssign]]'s centroids.
  *
  * The sample-size/quality trade: words below the frequency cutoff
  * contribute no pair counts, so very-low-frequency tail pairs can merge in
  * a different order than a full-table trainer would pick — the standard
  * trade every production BPE trainer makes (training on a frequency-capped
  * word table or a corpus sample). With `sampleCap` ≥ the distinct-word
  * count the sample IS the full table and training is exact — the gates run
  * in that regime, so the SQL oracle (which replays full-table training)
  * stays hash-green.
  *
  * Output: (step 1..merges, left, right, cnt) — the merge table itself
  * (driver-small by construction). Training stops early if no pair is left.
  */
object BpeOps {

  /** Default bound on the driver-side training sample: 2^20 distinct words
    * (tens of MB of driver state at realistic word lengths). */
  val DefaultSampleCap: Int = 1 << 20

  /** Code-point symbols of a word (matches SQL `substr`'s code-point — not
    * UTF-16 code-unit — character semantics, so oracles replay exactly). */
  private[operators] def codePointSyms(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One greedy left-to-right non-overlapping application of (`a`,`b`). */
  private def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Greedy application of the whole trained table to one word, merge by
    * merge in rank order — the distributed single-pass apply. */
  private[operators] def segmentWord(w: String, table: Seq[(String, String)]): Array[String] = {
    var syms = codePointSyms(w)
    table.foreach { case (a, b) =>
      if (syms.length >= 2) syms = mergeOnce(syms, a, b)
    }
    syms
  }

  /** Code-point lexicographic compare — identical to UTF-8 unsigned-byte
    * order, which is what Spark's UTF8String sort and DuckDB's default
    * VARCHAR collation both use. JVM String.compareTo is UTF-16 code-UNIT
    * order, which DISAGREES beyond the BMP (surrogates sort low), so the
    * tie-break must not use it — a count tie between a U+FFFD pair and an
    * emoji pair would otherwise pick a different winner than the SQL
    * oracle and diverge every later merge. */
  private[operators] def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    (a.length - i) - (b.length - j)
  }

  /** (count desc, left cp-asc, right cp-asc) — the winner order, total
    * over (count, left, right) triples. */
  private val winnerOrd: java.util.Comparator[(Long, String, String)] =
    new java.util.Comparator[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        var c = java.lang.Long.compare(y._1, x._1) // count DESC
        if (c == 0) c = cpCompare(x._2, y._2)
        if (c == 0) c = cpCompare(x._3, y._3)
        c
      }
    }

  /** In-memory exact trainer over a (syms, freq) word table: the same
    * counting/tie-break/application semantics as the relational loop it
    * replaces. Pair counts are maintained INCREMENTALLY (only words
    * containing the winning pair are re-processed per round) and the
    * argmax comes from an ordered set updated alongside each count change
    * — O(affected words × log pairs) per merge, never a full pair-table
    * scan per round, so a 32k–100k-merge run is bounded by total count
    * churn, not merges × distinct-pairs. */
  private[operators] def trainInMemory(words0: Array[(Array[String], Long)],
                                       merges: Int): Seq[(Long, String, String, Long)] = {
    val syms = words0.map(_._1)
    val freq = words0.map(_._2)
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val ranked = new java.util.TreeSet[(Long, String, String)](winnerOrd)
    val index = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.ArrayBuffer[Int]]
    def count(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val f = freq(wi) * sign
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val old = counts.getOrElse(p, 0L)
        val c = old + f
        if (old != 0L) ranked.remove((old, p._1, p._2))
        if (c == 0L) counts.remove(p)
        else { counts(p) = c; ranked.add((c, p._1, p._2)) }
        if (sign > 0L) {
          val buf = index.getOrElseUpdate(
            p, scala.collection.mutable.ArrayBuffer.empty)
          // Adjacent occurrences within one word arrive consecutively —
          // skipping equal-last dedups the common repeat cheaply; cross-
          // round duplicates are handled by `.distinct` at consumption.
          if (buf.isEmpty || buf.last != wi) buf += wi
        }
        i += 1
      }
    }
    syms.indices.foreach(count(_, 1L))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    while (step <= merges && !ranked.isEmpty) {
      val (c, a, b) = ranked.first()
      learned += ((step.toLong, a, b, c))
      // Index entries go stale after unrelated merges rewrite a word; the
      // remove/re-add pair makes reprocessing a stale word a no-op.
      index.remove((a, b)).foreach(_.distinct.foreach { wi =>
        count(wi, -1L)
        syms(wi) = mergeOnce(syms(wi), a, b)
        count(wi, 1L)
      })
      step += 1
    }
    learned.toSeq
  }

  /** The shared trainer: corpus → word-frequency table (one scan,
    * cache-persisted), bounded deterministic sample → driver training,
    * trained table → one distributed apply pass. Returns the merge list
    * and the segmented full word table (w, freq, syms) — recomputable
    * lineage (a released cache degrades to recomputation, never a hard
    * failure; no checkpoint lifecycle for callers to manage). */
  private def train(docs: DataFrame, merges: Int, sampleCap: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    require(merges >= 1 && merges <= (1 << 17),
      s"merges must be in 1..131072: $merges")
    require(sampleCap >= 1, s"sampleCap must be positive: $sampleCap")
    val spark = docs.sparkSession
    import spark.implicits._
    // length > 0 guard: empty tokens (double spaces) carry no pairs and
    // would otherwise pollute the word table. Persisted (registered with
    // [[graft.core.Caches]] — release after consuming): the sample collect
    // materializes it, and the returned segmented plan re-reads the cache
    // instead of re-scanning the corpus — ONE corpus scan total.
    val wordFreq = graft.core.Caches.persistTracked(
      docs.select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("freq")))
    // Bounded deterministic training sample: the most frequent `sampleCap`
    // words (freq desc, w asc) — a TakeOrdered (per-partition top-N +
    // driver merge), never a full sort/collect.
    val sample: Array[(String, Long)] = wordFreq
      .orderBy(col("freq").desc, col("w"))
      .limit(sampleCap)
      .as[(String, Long)].collect()
    val learned = trainInMemory(
      sample.map { case (w, f) => (codePointSyms(w), f) }, merges)
    val table = learned.map { case (_, a, b, _) => (a, b) }
    // Distributed apply: the trained table rides the closure (merge tables
    // are KBs–MBs), each word segmented once — a typed map over the
    // vocabulary-sized table, the one genuinely imperative per-row step.
    val segmented: Dataset[(String, Long, Seq[String])] = wordFreq
      .as[(String, Long)]
      .map { case (w, f) => (w, f, segmentWord(w, table).toSeq) }
    (learned, segmented.toDF("w", "freq", "syms"))
  }

  /** The shared tokenizer artifact a DEPLOYMENT consumes: the learned
    * merge list plus the segmented word table (persisted via
    * [[graft.core.Caches]] — release after consuming, like every
    * pipeline intermediate). The three `bpe*` gates each retrain from
    * scratch (gate independence against their oracles); a pipeline that
    * needs several surfaces — merge table, vocabulary, per-doc budgets —
    * builds this ONCE and derives them all, paying the corpus scan and
    * the in-memory training a single time. */
  final case class BpeModel(learned: Seq[(Long, String, String, Long)],
                            words: DataFrame)

  /** Train once, share everywhere: the model behind [[bpeMerges]] /
    * [[bpeVocab]] / [[bpeDocTokens]], exposed for deployment-shaped use. */
  def bpeModel(docs: DataFrame, merges: Int,
               sampleCap: Int = DefaultSampleCap): BpeModel = {
    val (learned, words) = train(docs, merges, sampleCap)
    BpeModel(learned, words)
  }

  /** The merge table of a trained model: (step, lhs, rhs, cnt). */
  def mergesOf(model: BpeModel): DataFrame = {
    val spark = model.words.sparkSession
    import spark.implicits._
    model.learned.toDF("step", "lhs", "rhs", "cnt")
  }

  /** The vocabulary surface of a trained model: (subword, cnt). */
  def vocabOf(model: BpeModel): DataFrame =
    model.words.select(col("freq"), explode(col("syms")).as("subword"))
      .groupBy("subword").agg(sum("freq").as("cnt"))

  /** Per-document token counts under a trained model: one corpus scan
    * joined to the vocabulary-sized word table (AQE broadcasts it).
    * Output: (doc_id, n_subtokens). */
  def docTokensOf(model: BpeModel, docs: DataFrame,
                  idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .join(model.words.select(col("w"),
        size(col("syms")).cast("long").as("n")), "w")
      .groupBy("doc_id").agg(sum("n").as("n_subtokens"))

  /** Train `merges` BPE merges over the whitespace tokens of `text` and
    * return the merge table: (step, lhs, rhs, cnt). */
  def bpeMerges(docs: DataFrame, merges: Int,
                sampleCap: Int = DefaultSampleCap): DataFrame =
    mergesOf(bpeModel(docs, merges, sampleCap))

  /** The tokenizer's VOCABULARY after `merges` trained merges: every
    * subword symbol the segmented corpus uses, with its total occurrence
    * count (word frequency × occurrences in the word) — the inference-side
    * surface of [[bpeMerges]] (symbol table sizing, coverage checks).
    * Output: (subword, cnt). */
  def bpeVocab(docs: DataFrame, merges: Int,
               sampleCap: Int = DefaultSampleCap): DataFrame =
    vocabOf(bpeModel(docs, merges, sampleCap))

  /** Per-document TOKEN COUNT under the trained tokenizer — the budget
    * number a context-packing / cost-estimation step actually needs (a
    * whitespace count undercounts rare words, which BPE splits): train
    * `merges` merges, then each document's count is the sum of its words'
    * segmented lengths. One corpus re-scan joined to the vocabulary-sized
    * word table (AQE broadcasts it), one map-side-combined sum. Output:
    * (doc_id, n_subtokens). */
  def bpeDocTokens(docs: DataFrame, idCol: String, merges: Int,
                   sampleCap: Int = DefaultSampleCap): DataFrame =
    docTokensOf(bpeModel(docs, merges, sampleCap), docs, idCol)
}
