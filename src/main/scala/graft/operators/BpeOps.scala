package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *     ("aa", "a")). Sequential-looking, but relational: occurrences of the
  *     winning pair at consecutive positions form runs, and greedy keeps
  *     exactly the odd-indexed occurrence within each run — a window
  *     parity, not a fold. (For left ≠ right, occurrence positions are
  *     always ≥ 2 apart and every run is a singleton.)
  *
  * Scale shape: the corpus is scanned ONCE (the word-frequency groupBy,
  * map-side combined); every training round then works on the DISTINCT-WORD
  * table — vocabulary-sized, ≪ corpus — with per-word windows (partitions
  * bounded by word length) and a symbol-pair-vocabulary-sized count
  * aggregate. Each round collects exactly one row (the winning pair) —
  * model-sized driver state, the [[VectorOps.kmeansAssign]] contract — and
  * re-roots the word table at an eager localCheckpoint (see the loop
  * comment; all checkpoints are released before returning).
  *
  * Output: (step 1..merges, left, right, cnt) — the merge table itself
  * (driver-small by construction). Training stops early if no pair is left.
  */
object BpeOps {

  /** Characters of `w` as an array column (1-based substr — no regex-split
    * zero-width-match edge cases to replay cross-engine). */
  private def chars(w: org.apache.spark.sql.Column) =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** (w, freq, pos, sym) symbol explode of the word table. */
  private def exploded(words: DataFrame): DataFrame =
    words.select(col("w"), col("freq"),
      posexplode(col("syms")).as(Seq("pos", "sym")))

  /** Adjacent-pair counts over the current symbol table: (left, right, cnt),
    * overlapping occurrences counted, weighted by word frequency. */
  private def pairCounts(words: DataFrame): DataFrame =
    exploded(words)
      .withColumn("nxt",
        lead("sym", 1).over(Window.partitionBy("w").orderBy("pos")))
      .filter(col("nxt").isNotNull)
      .groupBy(col("sym").as("left"), col("nxt").as("right"))
      .agg(sum("freq").as("cnt"))

  /** One greedy non-overlapping merge of (`a`,`b`) in every word: runs of
    * consecutive occurrences keep odd positions only (window parity), kept
    * starts take the merged symbol, their successors drop out. */
  private def applyMerge(words: DataFrame, a: String, b: String): DataFrame = {
    val wn = Window.partitionBy("w").orderBy("pos")
    val ex = exploded(words)
    val occ = ex
      .withColumn("nxt", lead("sym", 1).over(wn))
      .filter(col("sym") === a && col("nxt") === b)
      .withColumn("rn", row_number().over(wn))
      .withColumn("rn2", row_number().over(
        Window.partitionBy(col("w"), col("pos") - col("rn")).orderBy("pos")))
      .filter(col("rn2") % 2 === 1)
      .select(col("w"), col("pos"))
    ex
      .join(occ.withColumn("st", lit(true)), Seq("w", "pos"), "left")
      .join(occ.select(col("w"), (col("pos") + 1).as("pos"), lit(true).as("dr")),
        Seq("w", "pos"), "left")
      .filter(col("dr").isNull)
      .select(col("w"), col("freq"),
        struct(col("pos"),
          when(col("st"), lit(a + b)).otherwise(col("sym")).as("sym")).as("ps"))
      .groupBy("w", "freq")
      .agg(transform(array_sort(collect_list(col("ps"))),
        x => x.getField("sym")).as("syms"))
  }

  /** The shared training loop: learned merge list + the final word table
    * (an eager localCheckpoint) + its backing RDD (caller releases — or
    * registers with [[graft.core.Caches]] if the returned plan consumes it). */
  private def train(docs: DataFrame, merges: Int)
      : (Seq[(Long, String, String, Long)], DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
    require(merges >= 1 && merges <= 64,
      s"merges must be in 1..64 (each round is a distributed job): $merges")
    // Each round's word table is an EAGER localCheckpoint: [[applyMerge]]
    // self-joins its input, so Spark's self-join de-duplication clones the
    // upstream subtree ~3× per round — a plain persist leaves the LOGICAL
    // plan growing 3^rounds and analysis exhausts the heap long before any
    // data does (the [[DedupOps.nearDupClusters]] hazard). The checkpoint
    // re-roots each round at a constant-size tree; superseded rounds are
    // freed in-loop, the last one before returning (the result is
    // driver-local, so nothing downstream reads it).
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }
    // length > 0 guard: Spark's sequence(1, 0) counts DOWN (yielding two
    // phantom empty symbols for an empty token), so empty tokens are
    // excluded explicitly — they carry no pairs anyway.
    var words = docs.select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), chars(col("w")).as("syms"))
      .localCheckpoint()
    var wordsRdd = ckptRdd(words)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to merges if !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((step.toLong, a, b, c))
        val next = applyMerge(words, a, b).localCheckpoint()
        wordsRdd.foreach(_.unpersist(blocking = false)) // superseded round
        words = next
        wordsRdd = ckptRdd(next)
      }
    }
    (learned.toSeq, words, wordsRdd)
  }

  /** Train `merges` BPE merges over the whitespace tokens of `text` and
    * return the merge table: (step, lhs, rhs, cnt). */
  def bpeMerges(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (learned, _, wordsRdd) = train(docs, merges)
    wordsRdd.foreach(_.unpersist(blocking = false)) // result is driver-local
    import spark.implicits._
    learned.toDF("step", "lhs", "rhs", "cnt")
  }

  /** The tokenizer's VOCABULARY after `merges` trained merges: every
    * subword symbol the segmented corpus uses, with its total occurrence
    * count (word frequency × occurrences in the word) — the inference-side
    * surface of [[bpeMerges]] (symbol table sizing, coverage checks).
    * Output: (subword, cnt). The returned plan reads the final training
    * checkpoint, registered with [[graft.core.Caches]] — consume, then
    * release. */
  def bpeVocab(docs: DataFrame, merges: Int): DataFrame = {
    val (_, words, wordsRdd) = train(docs, merges)
    wordsRdd.foreach(graft.core.Caches.trackRdd)
    exploded(words)
      .groupBy(col("sym").as("subword"))
      .agg(sum("freq").as("cnt"))
  }

  /** Per-document TOKEN COUNT under the trained tokenizer — the budget
    * number a context-packing / cost-estimation step actually needs (a
    * whitespace count undercounts rare words, which BPE splits): train
    * `merges` merges, then each document's count is the sum of its words'
    * segmented lengths. One corpus re-scan joined to the vocabulary-sized
    * word table (AQE broadcasts it), one map-side-combined sum. Output:
    * (doc_id, n_subtokens). Reads the training checkpoint — consume, then
    * release [[graft.core.Caches]]. */
  def bpeDocTokens(docs: DataFrame, idCol: String, merges: Int): DataFrame = {
    val (_, words, wordsRdd) = train(docs, merges)
    wordsRdd.foreach(graft.core.Caches.trackRdd)
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .join(words.select(col("w"), size(col("syms")).cast("long").as("n")), "w")
      .groupBy("doc_id").agg(sum("n").as("n_subtokens"))
  }
}
