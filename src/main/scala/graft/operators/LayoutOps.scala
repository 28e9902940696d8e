package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Multi-dimensional data LAYOUT for scan pruning — the write-path side of
  * a 100 TB engine. A table clustered by the Morton (Z-order) key of its
  * hot filter dimensions gives every file/row-group a tight bounding box
  * over BOTH dimensions at once, so the reader's min/max stats skip most
  * of the corpus for a 2-D range predicate; a 1-D (ingest-order) layout
  * leaves one dimension unsorted and prunes nothing on it. These operators
  * compute the layout keys and MEASURE the pruning effect — candidate
  * buckets and rows under a box predicate per layout — so the choice is a
  * number, not folklore.
  *
  * Everything is integer-exact (z-values, bucket ids, min/max/counts), so
  * the DuckDB oracle replays the interleave and the whole report.
  */
object LayoutOps {

  /** Z-order key of two pre-quantized non-negative dimensions (low 16 bits
    * each) — [[graft.plans.ZOrder2]], codegen'd. */
  def zkey(x: Column, y: Column): Column =
    call_function(GraftFunctions.ZOrderName, x.cast("long"), y.cast("long"))

  /** Per-bucket bounding-box stats of a layout: rows bucketed by
    * `bucket(row)` (e.g. top z-bits = files of a z-sorted write, or an
    * ingest-order hash = files of an unsorted write), with per-bucket
    * count and min/max of each dimension — exactly the footer stats a
    * parquet reader prunes with.
    *
    * Scale shape: one scan, one partial-aggregated shuffle on the bucket
    * id (cardinality = file count, not rows). */
  def bucketStats(df: DataFrame, bucket: Column, x: Column, y: Column): DataFrame =
    df.select(bucket.cast("long").as("bucket"), x.cast("long").as("x"),
        y.cast("long").as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))

  /** The z-sorted WRITE path itself: range-partition on the z-key into
    * `nFiles` output files and sort within each, so every parquet file
    * holds one contiguous z-range — the layout whose footer min/max
    * stats [[pruneStats]] measures. The z-key column rides along in the
    * output (`zCol`) as the clustering key a compaction job re-sorts by.
    *
    * Scale shape: `repartitionByRange` samples the z-key to cut
    * balanced contiguous ranges (one shuffle — the sort is per-file,
    * never global), and the interleave itself is the codegen'd
    * [[graft.plans.ZOrder2]] under the write projection. A contiguous
    * run of z covering 1/n of the key space projects onto at most two
    * quadtree tiles per axis, so per-file bounding boxes shrink ~√n per
    * axis where an ingest-order write spans the whole domain —
    * file-level proof pinned in LayoutOpsSpec via input_file_name(). */
  def zorderWrite(df: DataFrame, x: Column, y: Column, path: String,
                  nFiles: Int, zCol: String = "graft_z"): Unit =
    df.withColumn(zCol, zkey(x, y))
      .repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)

  /** Pruning effectiveness of a layout for the box predicate
    * `x ∈ [xlo, xhi] ∧ y ∈ [ylo, yhi]`: from the layout's bucket stats,
    * the buckets whose bounding box intersects the query box (= files a
    * stats-pruning reader must open) and the rows they hold. Returns one
    * row: (n_buckets, cand_buckets, cand_rows). */
  def pruneStats(stats: DataFrame, xlo: Long, xhi: Long,
                 ylo: Long, yhi: Long): DataFrame = {
    val hit = col("min_x") <= xhi && col("max_x") >= xlo &&
      col("min_y") <= yhi && col("max_y") >= ylo
    stats.agg(count(lit(1)).as("n_buckets"),
      sum(when(hit, 1L).otherwise(0L)).as("cand_buckets"),
      sum(when(hit, col("n_rows")).otherwise(0L)).as("cand_rows"))
  }
}
