package graft.core

/** The three geometric partitioning strategies of the MR-skyline family
  * (MR-Dim / MR-Grid / MR-Angle — Vlachou et al.'s angle-based space
  * partitioning line of work), as pure functions. Behavior mirrors the
  * reference (reference: `java/org.main/FlinkSkyline.java:686-876`) with one
  * documented divergence (D1).
  *
  * These matter only for MR-parity mode and its optimality metric — a plain
  * Spark `groupBy`+partial-aggregate needs no geometric key for correctness.
  */
object GeoPartitioners {

  /** MR-Dim: range-partition on dimension 0. Slice width = maxVal/partitions,
    * index truncated toward zero, clamped to [0, partitions-1].
    * (reference: `FlinkSkyline.java:706-712`)
    */
  def dimPartition(values: Array[Double], maxVal: Double, partitions: Int): Int = {
    val p = (values(0) / (maxVal / partitions)).toInt
    math.max(0, math.min(p, partitions - 1))
  }

  /** MR-Grid: hyper-octant bitmask — bit i set iff values(i) >= maxVal/2.
    * (reference: `FlinkSkyline.java:773-789`)
    *
    * Divergence D1 (SURVEY §2.3): the reference returns the raw mask with no
    * modulo, so with 2^dims > partitions some keys are never queried. We take
    * `mask % partitions`, matching the report's description
    * (`project_documentation.pdf` p.12 §3.12.2).
    */
  def gridPartition(values: Array[Double], maxVal: Double, partitions: Int): Int = {
    val mid = maxVal / 2.0
    var mask = 0
    var i = 0
    while (i < values.length) {
      if (values(i) >= mid) mask |= (1 << i)
      i += 1
    }
    mask % partitions
  }

  /** MR-Angle: hyperspherical angles φ_i = atan2(‖v_{i+1..d}‖, v_i),
    * normalized by π/2, averaged, scaled to the partition count, truncated,
    * clamped. 1-D input → partition 0.
    * (reference: `FlinkSkyline.java:826-875`)
    */
  def anglePartition(values: Array[Double], partitions: Int): Int = {
    val d = values.length
    val numAngles = d - 1
    if (numAngles < 1) return 0
    // Suffix sum of squares computed back-to-front: sumSq(i) = Σ_{j>i} v_j².
    var normalizedSum = 0.0
    var sumSqRest = 0.0
    var i = d - 1
    while (i >= 1) {
      sumSqRest += values(i) * values(i)
      i -= 1
      // at this point sumSqRest = Σ_{j>i} v_j²
      val angle = math.atan2(math.sqrt(sumSqRest), values(i))
      normalizedSum += angle / (math.Pi / 2.0)
    }
    val avgPosition = normalizedSum / numAngles
    val p = (avgPosition * partitions).toInt
    math.max(0, math.min(p, partitions - 1))
  }
}
