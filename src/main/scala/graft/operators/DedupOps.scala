package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Distinct word `n`-gram shingles of `text`; empty array when the
    * document has fewer than `n` tokens (such docs pair with nothing). */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: `k` independent permutations approximated by
    * seeding `xxhash64` with the band index; element j is the minimum hash
    * of any shingle under seed j. NULL-free; empty shingle set → NULL mins
    * are avoided by guarding upstream. */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, s => xxhash64(j, s))))

  /** Candidate near-duplicate pairs via LSH with `k` bands of one row each:
    * a pair is a candidate iff it agrees on at least one minhash value.
    * With one-row bands a pair of true Jaccard s is missed with probability
    * (1-s)^k — for k=12 and the s ≥ 0.5 pairs this detector targets, under
    * 10^-3; for near-identical documents, negligible.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, n: Int, k: Int): DataFrame = {
    val sig = docs
      .select(col(idCol).as("id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), posexplode(minhashSignature(col("sh"), k)))
      .toDF("id", "band", "hv")
    sig.as("a").join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.hv") === col("b.hv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Verified near-duplicate pairs: LSH candidates whose true shingle-set
    * Jaccard is ≥ num/den (integer cross-multiplication — no float compare).
    * Output: (id_a, id_b, c_inter, c_union).
    */
  def minhashNearDups(docs: DataFrame, idCol: String, n: Int, k: Int,
                      num: Int, den: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    minhashCandidates(docs, idCol, n, k)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("c_inter"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("c_union"))
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
