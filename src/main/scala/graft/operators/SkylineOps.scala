package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SkylineAgg.skyline_agg

/** DataFrame-level skyline operators.
  *
  * The centerpiece pattern: the skyline (Pareto frontier, minimization on
  * every dimension — reference: `java/org.main/ServiceTuple.java:53-77`) is
  * computed by the [[graft.functions.SkylineAgg]] aggregate, whose
  * partial/merge decomposition IS the reference's MR two-phase design
  * (local BNL per input partition, only local skylines cross the shuffle,
  * global BNL merge — reference: `java/org.main/FlinkSkyline.java:162-174`).
  *
  * Scale design (100 TB): the frontier is usually tiny relative to the input
  * (≪ 1% for realistic distributions), so every operator here does one full
  * scan to produce the frontier (map-side partial aggregation ⇒ O(skyline)
  * shuffle bytes per partition), then a second scan with a semi-join to
  * recover the original duplicate-preserving rows. The join strategy is left
  * to AQE: when the frontier is small (the common case) it becomes a runtime
  * broadcast join; for anti-correlated high-dim data the frontier can be
  * huge (the reference's own 4D runs blow up — BASELINE.md 4D row), and a
  * forced broadcast would kill the driver, so no hint is forced. No
  * full-data shuffle anywhere; both scans are codegen'd column pipelines.
  */
object SkylineOps {

  /** `array(dims...)` cast to double — the aggregate's input vector. */
  private def vec(dims: Seq[String]): Column =
    array(dims.map(d => col(d).cast("double")): _*)

  /** Distinct frontier points of `df` over `dims`, one column per dim. */
  def frontier(df: DataFrame, dims: Seq[String]): DataFrame =
    df.agg(skyline_agg(vec(dims)).as("sky"))
      .select(explode(col("sky")).as("p"))
      .select(dims.zipWithIndex.map { case (d, i) => col("p")(i).as(d) }: _*)
      .distinct()

  /** All non-dominated rows of `df` over `dims` (duplicates of frontier
    * points all survive — SURVEY §1.2). Equivalent to the SQL anti-join
    * `WHERE NOT EXISTS (dominating row)`.
    */
  def skylineRows(df: DataFrame, dims: Seq[String]): DataFrame =
    df.select(dims.map(col): _*)
      .join(frontier(df, dims), dims, "left_semi")

  /** TOP-K DOMINATING skyline points (the frontier restriction of the
    * top-k dominating query, Yiu & Mamoulis, VLDB'07 — "which Pareto
    * options matter MOST"): each DISTINCT skyline point scored by the
    * number of input rows it strictly dominates, ranked by (score desc,
    * dims asc). Output: dims..., dom_cnt, rnk ≤ k.
    *
    * Scale shape: the frontier is small by nature (it shrinks as dominance
    * gets easier), so it broadcasts, and scoring is ONE corpus scan through
    * a broadcast nested-loop join — O(n·|frontier|) comparisons with
    * nothing corpus-sized shuffled; the final rank windows over frontier-
    * sized data only. If a (high-dimensional) frontier ever outgrows
    * broadcast, pre-filter with [[gridPrefilter]] before scoring.
    */
  def topDominatingSkyline(df: DataFrame, dims: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"topDominatingSkyline needs k >= 1: k=$k")
    // frontier() IS the distinct point set in one scan — going through
    // skylineRows().distinct() would add a second corpus scan + semi-join
    // only to dedup back to it. Its dims come back double-cast (the
    // aggregate's vector type), so cast back to the input column types.
    val dtypes = df.select(dims.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    val sky = frontier(df, dims)
      .select(dims.map(c => col(c).cast(dtypes(c)).as(c)): _*)
    val le = dims.map(c => col(s"s.$c") <= col(s"r.$c")).reduce(_ && _)
    val lt = dims.map(c => col(s"s.$c") < col(s"r.$c")).reduce(_ || _)
    // Inner scoring join with the FRONTIER broadcast (the corpus streams
    // through it once); skyline points dominating nothing re-enter with a
    // zero count via a frontier-sized left join afterwards — a left-outer
    // scoring join would have to preserve the broadcast side, which Spark
    // (rightly) refuses to plan as a broadcast.
    val scored = df.select(dims.map(col): _*).as("r")
      .join(broadcast(sky.as("s")), le && lt)
      .groupBy(dims.map(c => col(s"s.$c").as(c)): _*)
      .agg(count(lit(1)).as("dom_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dom_cnt").desc +: dims.map(col): _*)
    sky.join(scored, dims, "left")
      .select(dims.map(col) :+ coalesce(col("dom_cnt"), lit(0L)).as("dom_cnt"): _*)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(dims.map(col) :+ col("dom_cnt") :+
        col("rnk").cast("long").as("rnk"): _*)
  }

  /** SKYLINE LAYERS (onion peeling): layer 1 is the frontier, layer i the
    * frontier of what the first i−1 layers left behind — the ranked
    * fallback structure a recommender walks when the Pareto set is too
    * small ("next-best options"). Output: dims..., layer ∈ 1..layers, with
    * duplicate rows of a layer point all tagged with that layer
    * (SURVEY §1.2 duplicate semantics per layer).
    *
    * Scale shape: each layer is one [[frontier]] aggregation scan (local
    * skylines partial-combine map-side, O(frontier) bytes shuffle) plus a
    * semi/anti join against the frontier point set — AQE broadcasts it
    * when small, exactly like [[skylineRows]]. `layers` is a small
    * constant by use case (the onion is walked a few levels deep, never
    * peeled to exhaustion), which also bounds the anti-join lineage chain.
    */
  def skylineLayerRows(df: DataFrame, dims: Seq[String], layers: Int): DataFrame = {
    require(layers >= 1 && layers <= 8,
      s"layers must be in 1..8 (peel-to-exhaustion is not the use case): $layers")
    val dtypes = df.select(dims.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    var rest = df.select(dims.map(col): _*)
    var out: Option[DataFrame] = None
    for (l <- 1 to layers) {
      val sky = frontier(rest, dims)
        .select(dims.map(c => col(c).cast(dtypes(c)).as(c)): _*)
      val rows = rest.join(sky, dims, "left_semi")
        .withColumn("layer", lit(l.toLong))
      out = Some(out.fold(rows)(_.unionAll(rows)))
      if (l < layers) rest = rest.join(sky, dims, "left_anti")
    }
    out.get
  }

  /** k-SKYBAND: all rows dominated by FEWER than `k` distinct points — the
    * relaxation of the skyline (= the 1-skyband) that answers "every option
    * that could enter some user's top-k under a monotone preference"
    * (Papadias et al., TODS'05 §6). Output: dims..., dom_cnt (< k), with
    * duplicate rows of a skyband point all kept (SURVEY §1.2 semantics).
    *
    * Scale shape — never an all-pairs dominator count: dominance strictly
    * decreases the onion layer, so (a) the k-skyband is contained in the
    * first k skyline layers, and (b) every dominator of a first-k-layers
    * point lies in those same layers. So the corpus is touched only by k
    * [[frontier]] aggregation scans (O(frontier) shuffle bytes each) plus
    * the final duplicate-recovering semi-join; the quadratic dominator
    * count runs on the candidate POINT set only (frontier-scale × k,
    * broadcast both sides), never on the corpus.
    */
  def skybandRows(df: DataFrame, dims: Seq[String], k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in 1..8 (the top-k use case): $k")
    val dtypes = df.select(dims.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    // Peel k layers of DISTINCT points (disjoint by construction — their
    // union needs no dedup).
    var rest = df.select(dims.map(col): _*)
    var cand: Option[DataFrame] = None
    for (l <- 1 to k) {
      val sky = frontier(rest, dims)
        .select(dims.map(c => col(c).cast(dtypes(c)).as(c)): _*)
      cand = Some(cand.fold(sky)(_.unionAll(sky)))
      if (l < k) rest = rest.join(sky, dims, "left_anti")
    }
    // Persisted: the candidate set feeds both sides of the dominator join
    // AND the duplicate-recovery join — without the cache each consumer
    // re-executes the whole k-scan peel chain. Registered with
    // [[graft.core.Caches]]; release after consuming the result.
    val pts = graft.core.Caches.persistTracked(cand.get)
    val le = dims.map(c => col(s"b.$c") <= col(s"a.$c")).reduce(_ && _)
    val lt = dims.map(c => col(s"b.$c") < col(s"a.$c")).reduce(_ || _)
    // Distinct-dominator count over the candidate point set (dominators of
    // a candidate are themselves candidates — see scaladoc). Left join so
    // dominated-by-nobody frontier points keep count 0.
    val counted = pts.as("a")
      .join(broadcast(pts.as("b")), le && lt, "left")
      .groupBy(dims.map(c => col(s"a.$c").as(c)): _*)
      .agg(count(col(s"b.${dims.head}")).as("dom_cnt"))
      .filter(col("dom_cnt") < k)
    // Duplicate recovery: equi-join back to the corpus — AQE broadcasts the
    // candidate side when small (the common case; no forced hint for the
    // same high-dim blow-up reason as [[skylineRows]]).
    df.select(dims.map(col): _*)
      .join(counted, dims)
      .select(dims.map(col) :+ col("dom_cnt"): _*)
  }

  /** Grouped skyline: non-dominated rows within each group. One shuffle on
    * the group keys for the frontier (partial-aggregated map-side), then a
    * broadcast semi-join on (groupCols ++ dims).
    */
  def groupedSkylineRows(df: DataFrame, groupCols: Seq[String], dims: Seq[String]): DataFrame = {
    val front = df.groupBy(groupCols.map(col): _*)
      .agg(skyline_agg(vec(dims)).as("sky"))
      .select(groupCols.map(col) :+ explode(col("sky")).as("p"): _*)
      .select(groupCols.map(col) ++
        dims.zipWithIndex.map { case (d, i) => col("p")(i).as(d) }: _*)
      .distinct()
    df.select((groupCols ++ dims).map(col): _*)
      .join(front, groupCols ++ dims, "left_semi")
  }

  /** The skyline family's shared DEPLOY artifact: the first `layers`
    * onion layers as one persisted DISTINCT point table (dims…, layer) —
    * built with the same peel chain as [[skylineLayerRows]] /
    * [[skybandRows]], materialized ONCE; the per-query consumers
    * ([[layerRowsFrom]], [[skybandRowsFrom]], [[topDominatingFrom]]) are
    * then point-table joins and one corpus scan each, never a re-peel.
    * Point tables are frontier-scale (they SHRINK as dominance gets
    * easier), so every consumer join broadcasts. Release via
    * [[graft.core.Caches.releaseAll]] after the consumers finish. */
  final case class SkylineModel(dims: Seq[String], layers: Int,
                                pts: DataFrame)

  /** Build a [[SkylineModel]]: `layers` [[frontier]] aggregation scans
    * (each O(frontier) shuffle bytes), anti-joining each layer's points
    * out before the next peel — [[skylineLayerRows]]'s exact chain on the
    * DISTINCT point set. */
  def skylineModel(df: DataFrame, dims: Seq[String],
                   layers: Int): SkylineModel = {
    require(layers >= 1 && layers <= 8,
      s"layers must be in 1..8 (the onion-walk use case): $layers")
    val dtypes = df.select(dims.map(col): _*).schema
      .fields.map(f => f.name -> f.dataType).toMap
    var rest = df.select(dims.map(col): _*)
    var out: Option[DataFrame] = None
    for (l <- 1 to layers) {
      val sky = frontier(rest, dims)
        .select(dims.map(c => col(c).cast(dtypes(c)).as(c)): _*)
      out = Some(out.fold(sky.withColumn("layer", lit(l.toLong)))(
        _.unionAll(sky.withColumn("layer", lit(l.toLong)))))
      if (l < layers) rest = rest.join(sky, dims, "left_anti")
    }
    SkylineModel(dims, layers,
      graft.core.Caches.persistTracked(out.get))
  }

  /** [[skylineLayerRows]] from a prebuilt model: ONE corpus scan through
    * a broadcast equi-join to the point table — every duplicate row of a
    * layer point comes back tagged with that layer (identical output to
    * the re-peeling operator at equal `layers`; spec-pinned). */
  def layerRowsFrom(m: SkylineModel, df: DataFrame): DataFrame =
    df.select(m.dims.map(col): _*)
      .join(broadcast(m.pts), m.dims)
      .select(m.dims.map(col) :+ col("layer"): _*)

  /** [[skybandRows]] from a prebuilt model (`k` ≤ the model's layers):
    * the dominator count runs over the model's first-k-layers point set
    * (point-scale, both sides broadcast), then one corpus equi-join
    * recovers duplicates — identical output to the re-peeling operator
    * (the k-skyband is contained in the first k layers, and so are all
    * its dominators). */
  def skybandRowsFrom(m: SkylineModel, df: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= m.layers,
      s"k=$k needs a model with >= k layers (built ${m.layers})")
    val pts = m.pts.filter(col("layer") <= k)
      .select(m.dims.map(col): _*)
    val le = m.dims.map(c => col(s"b.$c") <= col(s"a.$c")).reduce(_ && _)
    val lt = m.dims.map(c => col(s"b.$c") < col(s"a.$c")).reduce(_ || _)
    val counted = pts.as("a")
      .join(broadcast(pts.as("b")), le && lt, "left")
      .groupBy(m.dims.map(c => col(s"a.$c").as(c)): _*)
      .agg(count(col(s"b.${m.dims.head}")).as("dom_cnt"))
      .filter(col("dom_cnt") < k)
    df.select(m.dims.map(col): _*)
      .join(counted, m.dims)
      .select(m.dims.map(col) :+ col("dom_cnt"): _*)
  }

  /** [[topDominatingSkyline]] from a prebuilt model: the scoring join
    * streams the corpus once through the model's layer-1 frontier
    * (broadcast), then ranks frontier-scale rows — identical output to
    * the self-training operator. */
  def topDominatingFrom(m: SkylineModel, df: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"topDominatingFrom needs k >= 1: k=$k")
    val sky = m.pts.filter(col("layer") === 1)
      .select(m.dims.map(col): _*)
    val le = m.dims.map(c => col(s"s.$c") <= col(s"r.$c")).reduce(_ && _)
    val lt = m.dims.map(c => col(s"s.$c") < col(s"r.$c")).reduce(_ || _)
    val scored = df.select(m.dims.map(col): _*).as("r")
      .join(broadcast(sky.as("s")), le && lt)
      .groupBy(m.dims.map(c => col(s"s.$c").as(c)): _*)
      .agg(count(lit(1)).as("dom_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dom_cnt").desc +: m.dims.map(col): _*)
    sky.join(scored, m.dims, "left")
      .select(m.dims.map(col) :+ coalesce(col("dom_cnt"), lit(0L)).as("dom_cnt"): _*)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(m.dims.map(col) :+ col("dom_cnt") :+
        col("rnk").cast("long").as("rnk"): _*)
  }

  // ---------------------------------------------------------------- MR parity

  /** MR-Dim partition id as a column expression: range-partition on dim 0,
    * slice width maxVal/n, truncated toward zero, clamped to [0, n-1]
    * (reference: `java/org.main/FlinkSkyline.java:706-712`; math mirrors
    * [[graft.core.GeoPartitioners.dimPartition]]).
    */
  def dimPartitionCol(values: Column, maxVal: Double, n: Int): Column =
    greatest(lit(0), least(lit(n - 1), (values(0) / (maxVal / n)).cast("int")))

  /** MR-Grid partition id: hyper-octant bitmask (bit i ⇔ v_i ≥ maxVal/2),
    * taken mod n (divergence D1 resolved per the report — SURVEY §2.3;
    * reference: `java/org.main/FlinkSkyline.java:773-789`).
    */
  def gridPartitionCol(values: Column, dims: Int, maxVal: Double, n: Int): Column = {
    val mid = maxVal / 2.0
    val mask = (0 until dims)
      .map(i => when(values(i) >= mid, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
    mask % n
  }

  /** MR-Angle partition id: hyperspherical angles
    * φ_i = atan2(‖v_{i+1..d}‖, v_i) normalized by π/2, averaged, scaled to n,
    * truncated, clamped (reference: `java/org.main/FlinkSkyline.java:826-875`;
    * math mirrors [[graft.core.GeoPartitioners.anglePartition]]).
    */
  def anglePartitionCol(values: Column, dims: Int, n: Int): Column = {
    if (dims < 2) return lit(0)
    val angles = (0 until dims - 1).map { i =>
      val restSq = (i + 1 until dims).map(j => values(j) * values(j)).reduce(_ + _)
      atan2(sqrt(restSq), values(i)) / lit(math.Pi / 2.0)
    }
    val avg = angles.reduce(_ + _) / lit(dims - 1)
    greatest(lit(0), least(lit(n - 1), (avg * n).cast("int")))
  }

  /** The reference's (disabled) grid dominance pre-filter, safe in batch:
    * keep rows with at least one dimension < maxVal/2 — any all-≥-mid point
    * is dominated by the mid-corner unless the top octant is empty; the
    * reference keeps rows where NOT all dims ≥ mid
    * (reference: `java/org.main/FlinkSkyline.java:716-734`).
    */
  def gridPrefilter(df: DataFrame, dims: Seq[String], maxVal: Double): DataFrame = {
    val mid = maxVal / 2.0
    df.filter(dims.map(d => col(d) < mid).reduce(_ || _))
  }

  /** Explicit two-phase MR skyline (parity demonstration): geometric
    * partition → per-partition local skyline → merge of local skylines →
    * global skyline. Emits the duplicate-preserving global multiset (each
    * partition's local phase keeps its own duplicates; equal vectors never
    * dominate, so the merge keeps all of them) — identical row multiset to
    * [[skylineRows]].
    */
  def mrSkylinePoints(df: DataFrame, dims: Seq[String], pid: Column): DataFrame = {
    val local = df.withColumn("graft_pid", pid)
      .groupBy("graft_pid")
      .agg(skyline_agg(vec(dims)).as("sky"))
    local.select(explode(col("sky")).as("v"))
      .agg(skyline_agg(col("v")).as("sky"))
      .select(explode(col("sky")).as("p"))
      .select(dims.zipWithIndex.map { case (d, i) => col("p")(i).as(d) }: _*)
  }

  /** Per-partition skyline statistics for the optimality metric
    * (reference formula: `java/org.main/FlinkSkyline.java:590-608`, caveat
    * D4): for each logical partition, `c_local` = rows on the partition's
    * local skyline (duplicates counted), `c_surv` = rows on the global
    * skyline (all of which are necessarily on their local skyline).
    */
  def partitionSkylineStats(df: DataFrame, dims: Seq[String], pid: Column): DataFrame =
    partitionSkylineStatsFull(df, dims, pid)
      .select(col("pid"), col("c_local"), col("c_surv"))

  /** [[partitionSkylineStats]] plus `c_rows` (total rows per partition),
    * still two input scans: classification of every row happens in one left
    * join against the marked local frontiers. */
  def partitionSkylineStatsFull(df: DataFrame, dims: Seq[String], pid: Column): DataFrame =
    statsByKeys(df.select((pid.as("pid") +: dims.map(col)): _*), dims, Nil)
      .select(col("pid").cast("int").as("pid"), col("c_rows"),
        col("c_local"), col("c_surv"))

  /** The stats pipeline behind [[partitionSkylineStatsFull]], generalized to
    * extra leading group keys (used by [[triggerCadence]] to compute every
    * barrier's stats in ONE pass): `tagged` carries `keys ++ "pid" ++ dims`;
    * local frontiers group by (keys, pid), the global frontier by keys.
    * Output: one row per (keys, pid) with c_rows / c_local / c_surv.
    */
  private def statsByKeys(tagged: DataFrame, dims: Seq[String],
                          keys: Seq[String]): DataFrame = {
    val pk = keys :+ "pid"
    // Scan 1: per-(keys, partition) local frontiers (map-side partial
    // aggregation).
    val localFront = tagged.groupBy(pk.map(col): _*)
      .agg(skyline_agg(vec(dims)).as("sky"))
      .select(pk.map(col) :+ explode(col("sky")).as("p"): _*)
      .select(pk.map(col) ++
        dims.zipWithIndex.map { case (d, i) => col("p")(i).as(d) }: _*)
      .distinct()
    // Global frontier = skyline of the union of local frontiers (the MR
    // merge property) — computed from the frontier-sized intermediate, NOT
    // by re-scanning the input. Every global-skyline point is on its own
    // partition's local skyline, so marking localFront rows that survive
    // globally classifies every local-skyline row in one pass.
    val globalFront = localFront
      .groupBy(keys.map(col): _*)
      .agg(skyline_agg(vec(dims)).as("sky"))
      .select(keys.map(col) :+ explode(col("sky")).as("p"): _*)
      .select(keys.map(col) ++
        dims.zipWithIndex.map { case (d, i) => col("p")(i).as(d) }: _*)
      .distinct()
      .withColumn("in_glob", lit(1))
    val marked = localFront
      .join(globalFront, keys ++ dims, "left")
      .withColumn("in_loc", lit(1))
    // Scan 2: one left join (marked is distinct on (keys, pid, dims) — no
    // row multiplication) classifies every row and yields all three counts
    // in a single aggregate.
    tagged.join(marked, pk ++ dims, "left")
      .groupBy(pk.map(col): _*)
      .agg(count(lit(1)).as("c_rows"), count(col("in_loc")).as("c_local"),
        count(col("in_glob")).as("c_surv"))
  }

  /** The reference's emitted result record (byte-layout parity with the
    * hand-built JSON at `java/org.main/FlinkSkyline.java:625-650`):
    * query_id, record_count, skyline_size, optimality (%.4f), and the four
    * timing fields. Divergence D3 preserved: `query_latency_ms` is computed
    * by the reference but absent from the emitted record, so it is absent
    * here too. Batch semantics: the caller supplies the timings (the
    * barrier/ingestion clock is a streaming concept); the driver-facing
    * query pins them to 0 for determinism.
    */
  private val RecordFmt =
    "{\"query_id\": \"%s\", \"record_count\": %d, \"skyline_size\": %d, " +
      "\"optimality\": %.4f, \"ingestion_time_ms\": %d, " +
      "\"local_processing_time_ms\": %d, \"global_processing_time_ms\": %d, " +
      "\"total_processing_time_ms\": %d}"

  def metricsJson(df: DataFrame, dims: Seq[String], pid: Column, partitions: Int,
                  queryId: String, ingestMs: Long = 0L, localMs: Long = 0L,
                  globalMs: Long = 0L, totalMs: Long = 0L): DataFrame =
    partitionSkylineStatsFull(df, dims, pid)
      .agg(
        // coalesce: an empty input has no partition rows, so the sums are
        // null — emit a zeroed record, not a null-poisoned json string.
        coalesce(sum(col("c_rows")), lit(0L)).as("rc"),
        coalesce(sum(col("c_surv")), lit(0L)).as("ss"),
        coalesce(sum(col("c_surv").cast("double") / col("c_local").cast("double"))
          / lit(partitions.toDouble), lit(0.0)).as("opt"))
      .select(format_string(RecordFmt,
        lit(queryId), col("rc"), col("ss"), col("opt"),
        lit(ingestMs), lit(localMs), lit(globalMs), lit(totalMs)).as("json"))

  /** O23 parity: the producer's auto-trigger cadence — "query every N
    * records" (`python/unified_producer.py:25,180-187`) — emulated in batch:
    * one [[metricsJson]]-format record per barrier over the prefix
    * `idCol ≤ b`, query ids numbered from 1 like the producer's counter.
    *
    * One scan family, not one per barrier: each row is tagged with EVERY
    * barrier prefix it belongs to (an explode whose ≤ B fanout is absorbed
    * by the map-side partial aggregation), then the shared stats pipeline
    * runs once grouped by (barrier, pid). At the reference's real cadence
    * (a trigger every 1M records → hundreds of barriers over a long stream)
    * this stays O(1) input scans where the naive per-barrier plan is O(B).
    * Barriers whose prefix is empty still emit a zeroed record (the same
    * empty-input rule as [[metricsJson]]).
    */
  def triggerCadence(df: DataFrame, idCol: String, dims: Seq[String], pid: Column,
                     partitions: Int, barriers: Seq[Long]): DataFrame = {
    require(barriers.nonEmpty, "triggerCadence needs at least one barrier")
    val qids = filter(
      array(barriers.zipWithIndex.map { case (b, i) =>
        when(col(idCol) <= b, lit(i + 1)) }: _*),
      q => q.isNotNull)
    val tagged = df.select(
      explode(qids).as("qid") +: pid.as("pid") +: dims.map(col): _*)
    val perQid = statsByKeys(tagged, dims, Seq("qid"))
      .groupBy("qid")
      .agg(
        sum(col("c_rows")).as("rc"), sum(col("c_surv")).as("ss"),
        (sum(col("c_surv").cast("double") / col("c_local").cast("double"))
          / lit(partitions.toDouble)).as("opt"))
    // Left join against the full barrier list: a barrier with an empty
    // prefix has no tagged rows at all, so it must be re-introduced here.
    df.sparkSession.range(1, barriers.size + 1)
      .select(col("id").cast("int").as("qid"))
      .join(perQid, Seq("qid"), "left")
      .orderBy("qid")
      .select(format_string(RecordFmt,
        col("qid").cast("string"),
        coalesce(col("rc"), lit(0L)), coalesce(col("ss"), lit(0L)),
        coalesce(col("opt"), lit(0.0)),
        lit(0L), lit(0L), lit(0L), lit(0L)).as("json"))
  }

  /** Scalar optimality per the reference's exact formula (D4): mean over the
    * FIXED partition count of (survivors_i / localSkylineSize_i); partitions
    * that produced no local skyline contribute 0 to the sum but stay in the
    * denominator. Rounded to 9 decimals — the final small-vector sum is the
    * one place engine-dependent double summation order could differ.
    */
  def optimality(df: DataFrame, dims: Seq[String], pid: Column, partitions: Int): DataFrame =
    partitionSkylineStats(df, dims, pid)
      .select((col("c_surv").cast("double") / col("c_local").cast("double")).as("ratio"))
      .agg(round(sum(col("ratio")) / lit(partitions.toDouble), 9).as("optimality"))
}
