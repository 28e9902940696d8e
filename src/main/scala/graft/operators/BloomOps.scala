package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the FIXED-SIZE alternative to
  * [[CorpusOps.decontaminate]]'s broadcast span set. The filter built from
  * the eval corpus is `m` bits regardless of how many eval spans exist, so
  * the train-side pass broadcasts kilobytes even when the eval suite (or a
  * blocklist, or a customer opt-out set) has grown past comfortable
  * broadcast size; the price is quantified false positives, which this
  * operator ACCOUNTS FOR against the exact semi-join rather than assuming.
  *
  * Determinism: k = 3 hash positions per span from three disjoint 4-hex-char
  * windows of the span's md5 (ascii-fold arithmetic — the same engine-neutral
  * recipe as [[TextOps.hashBucketCol]]), m = 65536 = one window's exact
  * range. Both engines replay every position bit-for-bit, so even the false
  * positives hash-match the oracle.
  */
object BloomOps {

  /** Filter width: one 4-hex-char window addresses exactly 2^16 bits. */
  val Bits = 65536

  /** Hex-char value (lowercase md5 hex) — engine-neutral ascii arithmetic. */
  private def hexVal(c: Column): Column =
    ascii(c) - when(ascii(c) >= 97, 87).otherwise(48)

  /** Bit position from the 4-hex-char window of `h` starting at `off`
    * (1-based): big-endian fold into [0, 65536). */
  private[operators] def pos(h: Column, off: Int): Column =
    hexVal(substring(h, off, 1)) * 4096 + hexVal(substring(h, off + 1, 1)) * 256 +
      hexVal(substring(h, off + 2, 1)) * 16 + hexVal(substring(h, off + 3, 1))

  /** The three window offsets (disjoint md5 hex windows). */
  private[operators] val Offsets = Seq(1, 9, 17)

  /** Decontamination accounting: train docs flagged by the m-bit Bloom
    * filter of the eval corpus' word-`n`-gram spans vs the exact span
    * semi-join, as one summary row —
    * (n_train_docs, n_flagged_bloom, n_flagged_exact, n_false_pos,
    * n_bits_set). Bloom flags are a superset of exact flags by
    * construction (a truly shared span sets all three of its own bits),
    * so `n_false_pos = bloom − exact` — the measured cost of the
    * fixed-size filter at this corpus' fill factor.
    *
    * Scale shape: the filter is built by one distinct-position aggregate
    * over eval spans and collected as AT MOST m integers — the bitset
    * itself, independent of eval cardinality — then shipped as a literal
    * (a broadcast no smaller eval set could beat). The train side is one
    * scan → per-(doc, span) distinct → per-doc max flags → global sum;
    * the only shuffles are keyed on span-dedup and doc id. With
    * `withExact = false` (production), the eval-span broadcast and its
    * join disappear entirely — the accounting branch is the gate-scale
    * probe, same contract as `kmvDistinct`'s `n_exact`.
    */
  def bloomDecontam(train: DataFrame, eval: DataFrame, idCol: String,
                    n: Int, withExact: Boolean = true): DataFrame = {
    val evalSpans = graft.plans.GraftFunctions.on(eval)
      .select(explode(DedupOps.shingles(col("text"), n)).as("s"))
      .select(md5(col("s")).as("h")).distinct()
    val bitsSet: Array[Int] = evalSpans
      .select(explode(array(Offsets.map(o => pos(col("h"), o)): _*)).as("p"))
      .distinct().collect().map(_.getInt(0)).sorted
    val bits = typedLit(bitsSet.toSeq)
    val t = graft.plans.GraftFunctions.on(train)
      .select(col(idCol).as("doc_id"),
        explode(DedupOps.shingles(col("text"), n)).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h")).distinct()
    val bloomHit = Offsets
      .map(o => array_contains(bits, pos(col("h"), o)))
      .reduce(_ && _)
    val flagged =
      if (withExact) {
        t.join(broadcast(evalSpans.select(col("h"), lit(1).as("ev"))),
            Seq("h"), "left")
          .groupBy("doc_id")
          .agg(max(when(bloomHit, 1L).otherwise(0L)).as("b"),
            max(when(col("ev").isNotNull, 1L).otherwise(0L)).as("e"))
      } else {
        t.groupBy("doc_id")
          .agg(max(when(bloomHit, 1L).otherwise(0L)).as("b"),
            lit(0L).as("e"))
      }
    flagged.agg(count(lit(1)).as("n_train_docs"),
        sum("b").as("n_flagged_bloom"), sum("e").as("n_flagged_exact"),
        (sum("b") - sum("e")).as("n_false_pos"))
      .select(col("n_train_docs"), col("n_flagged_bloom"),
        col("n_flagged_exact"), col("n_false_pos"),
        lit(bitsSet.length.toLong).as("n_bits_set"))
  }

  /** The deployable decontamination artifact: the SORTED set-bit positions
    * of the eval corpus' span filter — ≤ [[Bits]] integers of driver state
    * regardless of eval cardinality (blocklists and opt-out sets GROW; the
    * filter does not). Build once per eval-suite release; apply to every
    * training corpus with [[applyBloom]]. `n` is the word-n-gram width,
    * recorded with the bits so an apply at a different width cannot
    * silently mis-probe. */
  final case class BloomModel(bits: Array[Int], n: Int)

  /** Build a [[BloomModel]] from the eval corpus (text column `text`) —
    * one distinct-position aggregate, collected as the bitset. */
  def bloomModel(eval: DataFrame, n: Int): BloomModel = {
    val bitsSet = graft.plans.GraftFunctions.on(eval)
      .select(explode(DedupOps.shingles(col("text"), n)).as("s"))
      .select(md5(col("s")).as("h"))
      .select(explode(array(Offsets.map(o => pos(col("h"), o)): _*)).as("p"))
      .distinct().collect().map(_.getInt(0)).sorted
    BloomModel(bitsSet, n)
  }

  /** Per-document Bloom flags of `train` against a pre-built
    * [[BloomModel]] — the production apply pass: the filter enters the
    * plan as ONE literal array (kilobytes broadcast inside the plan
    * itself), the corpus side is one scan → per-(doc, span) distinct →
    * per-doc max. Output: (doc_id, flagged ∈ {0, 1}) for every train
    * doc; `filter(col("flagged") === 0)` is the keep-list. False-positive
    * accounting stays in [[bloomDecontam]] (it needs the eval spans,
    * which the model deliberately does not carry). */
  def applyBloom(m: BloomModel, train: DataFrame, idCol: String): DataFrame = {
    val bits = typedLit(m.bits.toSeq)
    val hit = Offsets
      .map(o => array_contains(bits, pos(col("h"), o)))
      .reduce(_ && _)
    // explode_OUTER: a doc shorter than n tokens (or with null text) has an
    // empty shingle array — it must still appear in the output, unflagged
    // (its null sentinel row hashes to a null `h`, which every probe reads
    // as not-hit). A plain explode dropped such docs entirely, silently
    // removing them from the documented keep-list recipe.
    graft.plans.GraftFunctions.on(train)
      .select(col(idCol).as("doc_id"),
        explode_outer(DedupOps.shingles(col("text"), m.n)).as("s"))
      .select(col("doc_id"), md5(col("s")).as("h")).distinct()
      .groupBy("doc_id")
      .agg(max(when(hit, 1L).otherwise(0L)).as("flagged"))
  }
}
