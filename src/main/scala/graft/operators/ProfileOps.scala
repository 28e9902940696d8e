package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the per-column expectations readout (row count,
  * null count, distinct count, min/max) an ingestion pipeline computes on
  * every batch before publishing it, and diffs against the previous batch to
  * catch schema rot / null storms / cardinality explosions.
  *
  * Scale shape: TWO pruned passes over the input, deliberately not one.
  * Spark plans n exact distinct aggregates as one Expand ×(n+1) pass, and a
  * single `agg(...)` carrying BOTH the distinct counts and min/max would put
  * string min/max buffers into that keyed Expand aggregate — string buffers
  * are not hash-aggregatable, so the whole aggregate falls back to
  * SortAggregate and SORTS the ×(n+1)-expanded input by its 5-part grouping
  * key (measured as the dominant cost of the r15 gate, ~4 s at sf0.1; at
  * 100 TB that sort is ~5× the table). Split, each family keeps its cheap
  * shape: the distinct pass is Expand ×n → pure HashAggregate (count buffers
  * only, string values are KEYS, which hash fine), and the count/min/max
  * pass has empty grouping keys, where sort-based aggregation degenerates to
  * a single fold with NO sort. Both results are one row; the cross join is a
  * trivial 1×1 broadcast and the unpivot stays driver-free via `stack`.
  * Min/max aggregate the NATIVE type and cast after (stringifying first
  * would make "9" > "10"); the production swap for a 100 TB batch is
  * `approx_count_distinct`, which collapses the Expand pass to one streaming
  * HLL pass, same output schema.
  *
  * Snapshot caveat: the two passes are two independent jobs, so on a source
  * that can change between actions (a JDBC relation, a concurrently-appended
  * table, a non-deterministic transform) n_distinct may reflect different
  * data than n_rows/n_null/min/max — the pre-split single-agg form was
  * internally consistent by construction. The gate inputs are immutable
  * parquet snapshots (both passes share the same file-sourced relation), so
  * they are safe; `df.persist()` before calling restores single-snapshot
  * semantics for mutable inputs.
  */
object ProfileOps {

  /** Long-form profile of `cols`: one output row per column —
    * (column, n_rows, n_null, n_distinct, min_s, max_s). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    // Names are interpolated into a selectExpr stack() string below; a quote
    // or backtick in a name would parse as SQL rather than fail clearly.
    cols.foreach { c =>
      require(!c.exists(ch => ch == '`' || ch == '\'' || ch == '\n'),
        s"profile: column name contains a quote/backtick/newline: $c")
    }
    val plainAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"${c}__nd"))
    val row = df.agg(plainAggs.head, plainAggs.tail: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nn`, `${c}__nd`, `${c}__mn`, `${c}__mx`").mkString(", ")
    row.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (column, _nn, n_distinct, min_s, max_s)",
      "__n AS n_rows")
      .select(col("column"), col("n_rows"),
        (col("n_rows") - col("_nn")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }

  /** Join-key skew profile — the readout a pipeline consults BEFORE
    * choosing a join strategy (plain / AQE skew-join / explicit salting
    * via [[JoinOps.saltedJoin]]): per-key row counts summarized as one
    * row of integer-exact statistics.
    *
    *   (n_rows, n_keys, max_cnt, hot_key, p50_cnt, p90_cnt, p99_cnt,
    *    skew_x1000)
    *
    * `hot_key` is the heaviest key (smallest value on ties, emitted as a
    * string so one schema covers any key type); percentiles are exact
    * count-quantiles over the count-of-counts histogram (the
    * [[CorpusOps.discQuantiles]] cumsum shape — state is |distinct count
    * values|, never |keys|); `skew_x1000` = max_cnt·n_keys·1000 div
    * n_rows, i.e. the hot key's multiple of the mean in thousandths —
    * the number AQE's skew threshold and a salt factor are sized from.
    *
    * Scale shape: one partial-aggregated groupBy(key) — the same shuffle
    * the prospective join would pay — then everything downstream operates
    * on the count-of-counts histogram: |distinct counts| rows, a one-row
    * sort-free cumsum window over it, and broadcast one-row joins. Null
    * keys count as a key (they hash-collide in a real join too — the
    * classic null-skew hazard this profile exists to expose). */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val perKey = graft.core.Caches.persistTracked(
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("cnt")))
    val hist = perKey.groupBy("cnt").agg(count(lit(1)).as("nk"))
    val cum = hist
      .withColumn("cum",
        sum("nk").over(org.apache.spark.sql.expressions.Window.orderBy("cnt")))
      .crossJoin(broadcast(hist.agg(sum("nk").as("n_keys"),
        sum(expr("cnt * nk")).as("n_rows"), max("cnt").as("max_cnt"))))
    val quants = cum.agg(
      min(when(col("cum") * 100 >= col("n_keys") * 50, col("cnt"))).as("p50_cnt"),
      min(when(col("cum") * 100 >= col("n_keys") * 90, col("cnt"))).as("p90_cnt"),
      min(when(col("cum") * 100 >= col("n_keys") * 99, col("cnt"))).as("p99_cnt"))
    val hot = perKey
      .orderBy(col("cnt").desc, col("k").cast("string").asc).limit(1)
      .select(col("k").cast("string").as("hot_key"))
    perKey.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"))
      .crossJoin(broadcast(hot))
      .crossJoin(broadcast(quants))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("hot_key"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        expr("(max_cnt * n_keys * 1000) div n_rows").as("skew_x1000"))
  }
}
