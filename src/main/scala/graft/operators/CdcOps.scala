package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction — the two standard readouts of a keyed
  * changelog (CDC feed, upsert stream, entity event log) that every
  * warehouse/lakehouse ingestion pipeline materializes:
  *
  *   - [[latestSnapshot]]: the CURRENT state — one row per key, the
  *     attributes of its latest change (a MERGE-style upsert compaction);
  *   - [[scd2]]: the HISTORY — slowly-changing-dimension type 2 validity
  *     intervals, consecutive runs of the same tracked value collapsed to
  *     one row with [valid_from, valid_to) bounds, open-ended for the
  *     current run.
  *
  * Scale shape: both are ONE shuffle on the entity key. The snapshot's
  * per-key top-1 is a `row_number() <= 1` filter, which Spark rewrites to
  * WindowGroupLimit — each map task keeps only its local latest row per key
  * before the shuffle, so the exchange carries ~|keys| rows, not |changes|
  * (the same partial-top-k physics as a map-side combine). The SCD2 pass is
  * windows + one aggregation over the same key partitioning, reused across
  * all three steps (lag → run id → run bounds) without re-shuffling.
  * Ordering within a key is (seq, tiebreak) — both integer columns, so the
  * run collapse is deterministic and oracle-replayable.
  */
object CdcOps {

  /** One row per `key`: the `attrs` of the latest change by
    * (`seq` desc, `tie` desc). Output: key, attrs*. */
  def latestSnapshot(changelog: DataFrame, key: String, seq: String,
                     tie: String, attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(seq).desc, col(tie).desc)
    changelog
      .select((Seq(key, seq, tie) ++ attrs).map(col): _*)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((key +: attrs).map(col): _*)
  }

  /** SCD2 validity intervals of `tracked` per `key`, ordered by
    * (`seq`, `tie`): consecutive equal values collapse into one interval;
    * `valid_to` is the next interval's `valid_from` (null = current).
    * Output: key, tracked, valid_from, valid_to, n_changes (rows collapsed
    * into the interval). */
  def scd2(changelog: DataFrame, key: String, seq: String, tie: String,
           tracked: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(seq), col(tie))
    // Run id = count of value changes up to the row (cumulative sum over the
    // same window — no second shuffle: same partitioning, same order).
    val runs = changelog
      .select(col(key), col(seq), col(tie), col(tracked))
      .withColumn("_chg",
        when(lag(col(tracked), 1).over(w).isNull ||
             lag(col(tracked), 1).over(w) =!= col(tracked), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_chg")).over(w))
    val iv = runs.groupBy(col(key), col("_run"), col(tracked))
      .agg(min(col(seq)).as("valid_from"), count(lit(1)).as("n_changes"))
    // Interval chaining orders by (valid_from, _run): two runs of a key can
    // share valid_from when a seq tie lands on a run boundary, and valid_from
    // alone would leave lead() nondeterministic there. _run is unique per key
    // and monotone in (seq, tie), so the composite order is total.
    val wk = Window.partitionBy(key).orderBy(col("valid_from"), col("_run"))
    iv.withColumn("valid_to", lead(col("valid_from"), 1).over(wk))
      .select(col(key), col(tracked), col("valid_from"), col("valid_to"),
        col("n_changes"))
  }
}
