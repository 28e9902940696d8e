package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — for each left row, the payload of the LATEST right row with
  * the same key and `right.ts <= left.ts` (inclusive; ties on ts broken by
  * the highest `ordCol`) — the temporal-enrichment operator feature
  * pipelines run ("state of X when Y happened") that neither an equi-join
  * nor a range join expresses efficiently.
  *
  * Spark has no built-in as-of join, and the naive range join
  * (`l.key = r.key AND r.ts <= l.ts` + a max-per-left reduction) explodes
  * quadratically per key. This is the scale shape instead: tag both inputs,
  * union them, and run ONE running `last(payload, ignoreNulls)` window per
  * key ordered by (ts, side, ord) — right rows sort BEFORE the left rows of
  * their timestamp (side 0 < 1), so an inclusive match is whatever payload
  * was last seen. One shuffle on the key, a linear incremental window frame
  * (never the per-key cross-product), and skew is bounded by per-key row
  * counts — the same bound the data itself imposes.
  *
  * Contract: both frames carry `keyCol`, `tsCol`, `ordCol`; `payloadCols`
  * exist on `right` and must not collide with `left`'s columns. Output =
  * every `left` row with `payloadCols` appended (all null when no right row
  * precedes it). All payload columns come from the SAME matched right row
  * BY CONSTRUCTION: the running `last` tracks ONE struct of the full
  * payload, tagged non-null exactly on right rows — so a right row whose
  * payload fields are legitimately null enriches as those nulls, never as
  * a mix of older rows' values.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, ordCol: String,
               payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, ordCol, payloadCols, forward = false)

  /** FORWARD as-of join — the mirror: for each left row, the payload of the
    * EARLIEST right row with the same key and `right.ts >= left.ts`
    * (inclusive; ties on ts broken by the LOWEST `ordCol`) — "the next
    * reading after the event" (label attribution, outcome lookups). Same
    * single-shuffle running-window shape, with the per-key order reversed
    * (ts desc, then ord desc), so the running `last` holds the nearest
    * FOLLOWING right row. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      tsCol: String, ordCol: String,
                      payloadCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, ordCol, payloadCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, ordCol: String,
                       payloadCols: Seq[String], forward: Boolean): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    require(payloadCols.forall(right.columns.contains),
      s"payload columns missing on right: ${payloadCols.filterNot(right.columns.contains)}")
    require(payloadCols.forall(c => !left.columns.contains(c)),
      s"payload columns collide with left: ${payloadCols.filter(left.columns.contains)}")
    val rTypes = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftCols = left.columns.toSeq
    // Align the union schema: left rows carry null payloads; right rows
    // carry null left-only columns (they are dropped after the window).
    val lAligned = left.select(
      leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(rTypes(c)).as(c)) :+
        lit(1).as("__side"): _*)
    val lTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val rAligned = right.select(
      leftCols.map(c =>
        if (c == keyCol || c == tsCol || c == ordCol) col(c)
        else lit(null).cast(lTypes(c)).as(c)) ++
        payloadCols.map(col) :+
        lit(0).as("__side"): _*)
    // Forward mode reverses the per-key scan (ts desc, ord desc); __side
    // stays ascending either way so an equal-ts right row is seen BEFORE
    // the left rows of that timestamp — inclusivity in both directions.
    val w = Window.partitionBy(keyCol)
      .orderBy(
        if (forward) col(tsCol).desc else col(tsCol),
        col("__side"),
        if (forward) col(ordCol).desc else col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct per right row (null on left rows — `when` without
    // `otherwise`), so the ignore-nulls last picks a whole right row
    // atomically even when individual payload fields are null.
    lAligned.unionAll(rAligned)
      .withColumn("__p", last(
        when(col("__side") === 0, struct(payloadCols.map(col): _*)),
        ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
