package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fuzzy-deduplication operators: MinHash+LSH near-duplicate pair detection
  * and SimHash document signatures.
  *
  * Scale shape (the whole point at 100 TB): candidate generation is a
  * hash-bucketed self-join on (band, minhash-value) — only documents that
  * collide in at least one band ever meet, never an all-pairs product. The
  * verification stage joins the (few) candidate pairs back to their shingle
  * sets and checks true Jaccard with integer arithmetic. Everything is
  * builtin column expressions (`xxhash64`, higher-order array functions) —
  * no UDFs, fully codegen'd, shuffles bounded by signature size × corpus,
  * not corpus².
  */
object DedupOps {

  /** Word `n`-gram shingles of `text` (duplicates retained — `array_distinct`
    * is quadratic per row, so set semantics are established downstream by an
    * explode + distinct, which Spark turns into a map-side-combined hash
    * aggregation); empty array when the document has fewer than `n` tokens
    * (such docs pair with nothing). */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle rows (id, s) — the set-semantics form shared by the
    * signature and verification stages. */
  def shingleRows(docs: DataFrame, idCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col("text"), n)).as("s"))
      .distinct()

  /** MinHash signature rows (id, band, hv) from distinct shingle rows
    * (id, s): `k` independent permutations approximated by seeding
    * `xxhash64` with the band index; a band's value is the minimum hash of
    * any shingle under that seed (MIN is invariant under duplicate shingles,
    * so set semantics in the input are optional).
    *
    * Shape note: built by exploding the shingle rows ONCE and reducing
    * per-band minima with a map-side-combined aggregation — an array-typed
    * signature expression would get inlined by projection collapse and
    * recompute the (quadratic) `array_distinct` shingling once per band. */
  def minhashSignatureRows(shingleRows: DataFrame, k: Int): DataFrame =
    shingleRows
      .select(col("id"), explode(array((0 until k).map(j =>
        struct(lit(j).as("band"), xxhash64(lit(j), col("s")).as("h"))): _*)).as("bh"))
      .groupBy(col("id"), col("bh.band").as("band"))
      .agg(min(col("bh.h")).as("hv"))

  /** Banded LSH keys: fold `b*r` minhash rows into `b` bands of `r` hash
    * columns (h0..h{r-1}) each — the equi-join key of the candidate stage. */
  def bandedSignatures(shingleRows: DataFrame, b: Int, r: Int): DataFrame = {
    val bandCols = (0 until r).map(t =>
      min(when(col("band") % r === t, col("hv"))).as(s"h$t"))
    minhashSignatureRows(shingleRows, b * r)
      .groupBy(col("id"), (col("band") / r).cast("int").as("band"))
      .agg(bandCols.head, bandCols.tail: _*)
  }

  /** Candidate near-duplicate pairs via banded LSH: a pair is a candidate
    * iff some band agrees on ALL r values. A pair of true Jaccard s is a
    * candidate with probability 1-(1-s^r)^b — the r rows suppress the
    * false-positive flood a shared-vocabulary corpus produces under one-row
    * bands (false positives scale with b·s^r), while near-identical pairs
    * (s ≥ 0.85 in this corpus) are missed with probability (1-s^r)^b ≈ 1e-5
    * at b=12, r=3. The join is an equi-join on the banded key — work is
    * bounded by bucket collisions, never the corpus cross-product. */
  def candidatePairs(sig: DataFrame, r: Int): DataFrame = {
    val keys = Seq("band") ++ (0 until r).map(t => s"h$t")
    val cond = keys.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _) &&
      col("a.id") < col("b.id")
    sig.as("a").join(sig.as("b"), cond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** [[candidatePairs]] from raw documents (convenience; no caching). */
  def minhashCandidates(docs: DataFrame, idCol: String, n: Int,
                        b: Int, r: Int): DataFrame =
    candidatePairs(bandedSignatures(shingleRows(docs, idCol, n), b, r), r)

  /** Verified near-duplicate pairs: LSH candidates whose true shingle-set
    * Jaccard is ≥ num/den (integer cross-multiplication — no float compare).
    * Output: (id_a, id_b, c_inter, c_union).
    *
    * The shingle rows and the banded signatures are persisted
    * (MEMORY_AND_DISK) so the text is shingled exactly once: without the
    * cache, the self-join of the candidate stage evaluates the
    * scan→shingle→36-hash→min-agg subtree on BOTH sides, and the
    * verification stage re-shingles a third time — 3 full build pipelines
    * for one query. Both cached sets are linear in the corpus (distinct
    * shingles; b rows of r longs per doc) and spill to disk if they outgrow
    * executor memory.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, n: Int, b: Int, r: Int,
                      num: Int, den: Int): DataFrame = {
    val sr  = shingleRows(docs, idCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    val sig = bandedSignatures(sr, b, r).persist(StorageLevel.MEMORY_AND_DISK)
    val sh = sr.groupBy("id").agg(collect_list(col("s")).as("sh"))
    candidatePairs(sig, r)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("c_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("c_union"))
      .filter(col("c_inter") * den >= col("c_union") * num)
  }

  /** Exact n-gram-Jaccard near-duplicate pairs — no LSH, no probability:
    * pairwise intersection sizes come from a self-join of the distinct
    * (id, shingle) rows on the shingle (only pairs sharing ≥1 shingle ever
    * materialize; a J ≥ num/den pair always does), union sizes from the
    * per-doc set sizes. Exact complement to [[minhashNearDups]]: cost
    * scales with shingle co-occurrence (hot shingles fan out — for
    * heavy-tailed corpora prefer the MinHash path or drop top-frequency
    * shingles first), not with the corpus cross-product.
    *
    * The distinct shingle rows are persisted (MEMORY_AND_DISK): they feed
    * both sides of the self-join plus the per-doc size aggregate — three
    * consumers of one linear-in-corpus build.
    */
  def jaccardNearDups(docs: DataFrame, idCol: String, n: Int,
                      num: Int, den: Int): DataFrame = {
    val sr = shingleRows(docs, idCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sr.groupBy("id").agg(count(lit(1)).as("sz"))
    sr.as("a").join(sr.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c_inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("c_inter"),
        (col("na") + col("nb") - col("c_inter")).as("c_union"))
      .filter(col("c_inter") * den >= col("c_union") * num)
  }

  /** 32-bit SimHash over whitespace tokens: bit p is set iff the sum over
    * tokens of ±1 (sign of bit p of the token's xxhash64) is ≥ 0. Documents
    * differing in a few tokens land at small Hamming distance. (No DuckDB
    * oracle — xxhash64 is engine-specific — so this surface gets the
    * driver's rows-only check.)
    */
  def simhashCol(text: Column): Column = {
    val hashes = transform(split(text, " "), t => xxhash64(t))
    // Unrolled at plan-build time (shift amounts must be Scala Ints); the
    // repeated `hashes` subtree is shared by codegen subexpression
    // elimination.
    (0 until 32).map { p =>
      when(aggregate(hashes, lit(0),
          (acc, h) => acc + when(shiftright(h, p).bitwiseAND(1) === 1, 1).otherwise(-1))
        >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
