package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction and conjunctive retrieval — the corpus-search
  * surface of a curation pipeline (find every document containing a probe
  * phrase's terms: contamination lookups, targeted audits, keep/drop-list
  * application at 100 TB).
  *
  * Scale shape: the token→document posting table is the one explode+shuffle
  * every text operator here already pays; the index statistics (df, cf) are
  * map-side-combined aggregates of it. Posting LISTS are capped per token
  * via a rank-window top-k — Spark rewrites `row_number() <= k` to
  * WindowGroupLimit, so each map task forwards at most k postings per token
  * and a hot token (stopword) cannot materialize an unbounded list (the
  * full posting set stays queryable as the uncapped relation; the capped
  * list is the browse/debug artifact). Conjunctive search is a semi-join
  * shape: filter the posting table to the probe terms (pushed to the scan),
  * count distinct matched terms per document, keep full matches — never a
  * per-term self-join chain.
  */
object IndexOps {

  private def postingsBase(docs: DataFrame, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col("text"))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t", "doc_id").agg(count(lit(1)).as("tf"))

  /** Index statistics + capped posting list per token: document frequency,
    * collection frequency, and the `cap` lowest doc_ids as a comma-joined
    * string (bounded browse artifact). Tokens below `minDf` are dropped.
    * Output: (t, df, cf, sample_docs). */
  def postings(docs: DataFrame, idCol: String, minDf: Long,
               cap: Int): DataFrame = {
    require(cap >= 1 && cap <= 1000, s"cap must be in 1..1000: $cap")
    val td = postingsBase(docs, idCol)
    val w = Window.partitionBy("t").orderBy("doc_id")
    val capped = td
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .groupBy("t")
      .agg(concat_ws(",", array_sort(collect_list(col("doc_id"))))
        .as("sample_docs"))
    td.groupBy("t")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .filter(col("df") >= minDf)
      .join(capped, "t")
  }

  /** Documents containing ALL probe `terms`, each with per-document
    * frequency >= `minTf`. Output: (doc_id, total_tf) — total occurrences
    * of probe terms in the matched document. */
  def conjunctive(docs: DataFrame, idCol: String, terms: Seq[String],
                  minTf: Long = 1L): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "terms must be non-empty and distinct")
    postingsBase(docs, idCol)
      .filter(col("t").isin(terms: _*) && col("tf") >= minTf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("k"), sum("tf").as("total_tf"))
      .filter(col("k") === terms.size)
      .select(col("doc_id"), col("total_tf"))
  }
}
