package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-training-data curation over a corpus
  * DataFrame (`documents`: doc_id, text, lang, source, n_chars).
  *
  * Everything here is a pure column expression over Spark builtins — no
  * Scala/Python UDFs — so the whole pipeline stays inside whole-stage
  * codegen and scales by partition count alone: tokenization via `split`,
  * scoring via higher-order array functions, fingerprints via `md5` on
  * shingles. At 100 TB these are embarrassingly parallel scans with
  * map-side partial aggregation; no shuffle carries more than the final
  * per-group aggregates.
  */
object TextOps {

  /** Whitespace tokens of `text` (single-space tokenizer — the corpus'
    * wire format; swap for a regex split for messier corpora). */
  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens that appear in `words` (duplicates counted — this is
    * an occurrence count, not a set intersection). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Tiny per-language stopword profiles for the lang-id heuristic.
    * Disjoint lists so scores are independent; order = tiebreak priority. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "y", "un"),
    "zh" -> Seq("的", "是", "了", "在", "和")
  )

  /** N-gram/stopword language-ID heuristic, as a two-projection DataFrame
    * shape: score each language by stopword occurrence count ONCE into a
    * real `s_<lang>` column ([[langScoreCols]]), then argmax over the column
    * REFERENCES ([[langArgmaxCol]]) with a fixed priority-order tiebreak
    * (profile order). Deterministic integer arithmetic end-to-end.
    *
    * Why two steps and not one Column: a single inlined argmax expression
    * repeats each (interpreted, higher-order) `hitCount` subtree inside
    * every pairwise comparison — O(L²) redundant lambda evaluations per row.
    * Projected score columns are evaluated once per row; the comparisons
    * over attribute references are free. CollapseProject keeps the
    * projection boundary because the producer expressions are non-cheap and
    * multiply-referenced.
    */
  def langIdDF(df: DataFrame, textCol: String): DataFrame =
    df.select(tokens(col(textCol)).as("w"))
      .select(langScoreCols(col("w")): _*)
      .select(langArgmaxCol.as("predicted"))

  /** One score column per language profile, aliased `s_<lang>`: stopword
    * occurrence count among the pre-split tokens column. */
  def langScoreCols(toks: Column): Seq[Column] =
    LangProfiles.map { case (l, ws) => hitCount(toks, ws).as(s"s_$l") }

  /** Argmax over projected `s_<lang>` columns: lang i wins iff no earlier
    * lang has score >= it and no later lang has score > it. */
  def langArgmaxCol: Column = {
    val names = LangProfiles.map(_._1)
    names.zipWithIndex.foldRight(lit(names.head)) { case ((lang, i), elseCol) =>
      val s = col(s"s_$lang")
      val beatsEarlier = names.take(i).foldLeft(lit(true))((acc, e) => acc && s > col(s"s_$e"))
      val beatsLater   = names.drop(i + 1).foldLeft(lit(true))((acc, e) => acc && s >= col(s"s_$e"))
      when(beatsEarlier && beatsLater, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality flags (integer arithmetic only, so the DuckDB oracle is exact):
    * length band, token-count band, stopword ratio ≥ 0.2, mean word length
    * in [3, 8]. Returns the number of passed flags (0–4).
    */
  /** The four boolean quality signals behind [[qualityScoreCol]], exposed
    * individually (feature extraction for model-based curation —
    * [[ModelOps]] trains on exactly these bits). */
  def qualityFlags(text: Column): Seq[Column] = {
    val toks    = tokens(text)
    val nTok    = size(toks)
    val nChars  = length(text)
    val stops   = hitCount(toks, LangProfiles.head._2)
    val letters = nChars - (nTok - lit(1)) // chars minus the separating spaces
    Seq(
      (nChars >= 50) && (nChars <= 2000),
      (nTok >= 10) && (nTok <= 500),
      stops * lit(5) >= nTok,
      (letters >= nTok * lit(3)) && (letters <= nTok * lit(8)))
  }

  def qualityScoreCol(text: Column): Column =
    qualityFlags(text).map(f => when(f, 1).otherwise(0)).reduce(_ + _)

  /** Winnowing-style document fingerprint: minimum md5 over the document's
    * word `n`-gram shingles (lexicographic min over hex strings — stable
    * across engines). NULL for documents shorter than `n` tokens.
    */
  def fingerprintCol(text: Column, n: Int): Column = {
    // Shingle strings from the native [[graft.plans.Shingles]] loop (the
    // DedupOps.shingles fix); only the per-shingle md5 map stays a
    // higher-order lambda.
    graft.plans.GraftFunctions.registerCurrent()
    val w = tokens(text)
    when(size(w) >= n,
      array_min(transform(
        call_function(graft.plans.GraftFunctions.ShinglesName, w, lit(n)),
        s => md5(s))))
      .otherwise(lit(null))
  }

  /** PII patterns, deliberately backslash-free (character classes only) so
    * the identical literal is a valid Java regex (Spark) and RE2 pattern
    * (DuckDB oracle): email, NANP-style dashed phone, http(s) URL. Swap in
    * stricter production patterns freely — the plumbing is pattern-agnostic. */
  val UrlRe   = "https?://[a-z0-9./-]+"
  val EmailRe = "[a-z0-9.]+@[a-z0-9]+[.][a-z0-9.]+"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Staged PII redaction: URLs first (a URL may embed email- or phone-like
    * substrings; they must redact as part of the URL, not separately), then
    * emails, then phones. Pure per-row codegen'd expression — at 100 TB this
    * is a scan-speed map with zero shuffle. */
  def redactPiiCol(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Per-row PII match counts (n_url, n_email, n_phone), staged to mirror
    * [[redactPiiCol]]: each count runs on the text with the earlier stages
    * already redacted, so the three counts sum to the exact number of
    * replacements the redaction performs. */
  def piiCountCols(text: Column): Seq[Column] = {
    val afterUrl   = regexp_replace(text, UrlRe, "<URL>")
    val afterEmail = regexp_replace(afterUrl, EmailRe, "<EMAIL>")
    Seq(regexp_count(text, lit(UrlRe)).cast("long").as("n_url"),
      regexp_count(afterUrl, lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(afterEmail, lit(PhoneRe)).cast("long").as("n_phone"))
  }

  /** md5 of whitespace-normalized, lowercased text — the exact-dedup key. */
  def normHashCol(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /** Exact deduplication: group by normalized-text hash, keep the lowest
    * doc_id as the canonical representative, count the duplicates. The
    * groupBy is a hash aggregation with map-side partial combine — the
    * shuffle carries one row per distinct hash, not per document.
    */
  def dedupExact(docs: DataFrame): DataFrame =
    docs.groupBy(normHashCol(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Per-document top-token statistics — the repetition signal curation
    * uses to drop degenerate text (a doc whose most frequent token owns most
    * of its length is boilerplate or generation collapse, not prose).
    * Output: (doc_id, top_cnt, tok_cnt); repetition ratio = top_cnt/tok_cnt.
    * Two map-side-combined aggregations: the shuffle carries (doc, token)
    * partial counts then per-doc pairs — never raw token streams. Only
    * null-text docs are absent; an empty-string doc tokenizes to one empty
    * token (split semantics, both engines) and counts with ratio 1.0. */
  def topTokenStats(docs: DataFrame, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top_cnt"), sum(col("c")).as("tok_cnt"))

  /** Sliding token-window CHUNKING — the context-window preparation step a
    * training/RAG pipeline runs over every document: chunks of `chunkLen`
    * tokens starting every `stride` tokens (overlap = chunkLen − stride),
    * the LAST chunk the first one to reach the document's end (a short
    * trailing remainder rides inside it as a partial window; documents
    * shorter than one window yield exactly one chunk; empty documents
    * none). Output: (id, chunk_idx 0.., chunk_text, n_tokens).
    *
    * Scale shape: one corpus scan, a per-row explode with fanout
    * ≈ tokens/stride (bounded by the document length contract, never by
    * corpus size), zero shuffle — chunk assembly is pure `slice` +
    * `array_join` column arithmetic inside codegen. Chunk identity is
    * (id, chunk_idx), deterministic under any partitioning. */
  def chunkRows(docs: DataFrame, idCol: String, chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be positive: $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in 1..chunkLen (gaps would drop tokens): $stride")
    val toks = filter(tokens(col("text")), t => length(t) > 0)
    docs
      .select(col(idCol).as("id"), toks.as("toks"), size(toks).as("n"))
      // Chunk count: 1 + ceil((n - chunkLen) / stride) for n > chunkLen,
      // else one chunk for any nonempty doc — integer arithmetic only.
      .withColumn("nc",
        when(col("n") > chunkLen,
          lit(1) + floor((col("n") - chunkLen + stride - 1) / stride).cast("int"))
          .when(col("n") > 0, lit(1))
          .otherwise(lit(0)))
      // sequence(0, -1) counts DOWN (phantom chunks for empty docs), so
      // the empty case must return an empty array explicitly — explode of
      // an empty array emits no rows, which is the contract.
      .select(col("id"), col("toks"), col("n"),
        explode(when(col("nc") > 0, sequence(lit(0), col("nc") - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_idx"))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("toks"), col("chunk_idx") * stride + 1,
          least(lit(chunkLen), col("n") - col("chunk_idx") * stride)), " ")
          .as("chunk_text"),
        least(lit(chunkLen), col("n") - col("chunk_idx") * stride)
          .cast("long").as("n_tokens"))
  }

  /** Deterministic content-hash bucket in [0, 100): three leading md5 hex
    * chars folded with engine-neutral ascii arithmetic (md5 hex text is
    * identical everywhere; no base-conversion builtin needed on either
    * side). Content-keyed, so re-runs, re-partitions, and re-shards never
    * move a document between buckets. */
  def hashBucketCol(text: Column): Column =
    (ascii(substring(md5(text), 1, 1)) * 59 +
      ascii(substring(md5(text), 2, 1)) * 17 +
      ascii(substring(md5(text), 3, 1))) % 100

  /** Deterministic train/val/test assignment by content-hash bucket — the
    * split step of a training-data pipeline, stable under any re-sharding
    * of a 100 TB corpus (a doc's split is a pure function of its text).
    * Pure per-row expression; no shuffle, no RNG. */
  def splitCol(text: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages out of range: train=$trainPct val=$valPct")
    val b = hashBucketCol(text)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** The Gopher rule stop list (Rae et al. arXiv:2112.11446, Table A1's
    * "required words"): a document must contain at least two of these. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule report (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446, Table A1) as per-rule INDEPENDENT violation
    * counts over the corpus, plus a final `kept` row counting documents
    * that violate no rule. The independent-count view is the audit a
    * mixture designer reads BEFORE committing to a filter chain: a
    * cascade like [[qualityScoreCol]]/curate_rules attributes each doc
    * only to its first failing rule, so it cannot say which rule does
    * the damage or how rules overlap.
    *
    * Rules, each the paper's bound rendered in exact integer arithmetic
    * at the corpus' whitespace tokenization (a rule that never fires on
    * a given corpus still reports its zero — that IS the audit):
    *   - `word_count`:   n_tokens outside [50, 100000]
    *   - `mean_word_len` mean word length outside [3, 10] chars
    *     (letters = len(text) − (n_tokens − 1) at single-space wire
    *     format; bound cross-multiplied, never divided)
    *   - `alpha_words`:  words containing an ASCII letter < 80%
    *   - `stop_words`:   fewer than 2 occurrences of [[GopherStops]]
    *   - `top_bigram`:   the most frequent word bigram covers > 20% of
    *     the doc's bigrams (the paper's top-2-gram character fraction,
    *     at token granularity)
    *   - `symbol_ratio`: '#'-bearing or '...'-suffixed tokens > 10%
    *
    * Output: (rule, n_violations), 7 rows (6 rules + `kept`), rule a
    * stable snake_case key.
    *
    * Scale shape: every flag except `top_bigram` is one codegen'd
    * projection over the doc scan; the bigram mode needs one
    * partial-combined (doc_id, bigram) count and a per-doc max — both
    * keyed aggregates bounded by document length, joined back 1:1 — and
    * the rollup reduces to 7 driver rows. No windows, no driver state. */
  def gopherReport(docs: DataFrame, idCol: String): DataFrame = {
    val toks = tokens(col("text"))
    val base = docs.select(col(idCol).as("id"),
      size(toks).as("nw"),
      (length(col("text")) - (size(toks) - lit(1))).as("letters"),
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).as("alpha"),
      hitCount(toks, GopherStops).as("stops"),
      size(filter(toks,
        t => t.contains("#") || t.endsWith("..."))).as("symbols"))
    // Per-doc top-bigram count: groupBy + join-back (partial-combining
    // aggregates bounded by doc length), NOT a window — the convention
    // everywhere in this library for per-key modes.
    val topBg = graft.plans.GraftFunctions.on(docs)
      .select(col(idCol).as("id"),
        explode(DedupOps.shingles(col("text"), 2)).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_bg"))
    val nBigrams = greatest(col("nw") - 1, lit(0))
    val flags: Seq[(String, Column)] = Seq(
      "word_count"    -> (col("nw") < 50 || col("nw") > 100000),
      "mean_word_len" -> (col("letters") < col("nw") * 3 ||
                          col("letters") > col("nw") * 10),
      "alpha_words"   -> (col("alpha") * 10 < col("nw") * 8),
      "stop_words"    -> (col("stops") < 2),
      "top_bigram"    -> (col("top_bg") * 5 > nBigrams),
      "symbol_ratio"  -> (col("symbols") * 10 > col("nw")))
    val aggCols = flags.map { case (n, f) =>
      sum(when(f, 1L).otherwise(0L)).as(n)
    } :+ sum(when(flags.map(_._2).reduce(_ || _), 0L).otherwise(1L))
      .as("kept")
    val counted = base
      .join(topBg, Seq("id"), "left")
      .withColumn("top_bg", coalesce(col("top_bg"), lit(0L)))
      .agg(aggCols.head, aggCols.tail: _*)
    counted.select(explode(array(
        (flags.map(_._1) :+ "kept").map(n =>
          struct(lit(n).as("rule"), col(n).as("n_violations"))): _*))
        .as("r"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"))
  }
}
