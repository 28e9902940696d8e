package graft.core

/** Pareto-dominance under minimization semantics.
  *
  * Mirrors the reference's comparator (reference:
  * `java/org.main/ServiceTuple.java:53-77`): `a` dominates `b` iff
  * `a(i) <= b(i)` for every dimension and `a(i) < b(i)` for at least one.
  * Consequences (SURVEY §1.2): equal vectors never dominate each other, so
  * duplicates of a skyline point all survive; incomparable points both
  * survive.
  */
object Dominance {

  /** True iff `a` dominates `b` (minimization). Arrays must have equal
    * length; no nulls inside.
    */
  def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    val d = a.length
    var strict = false
    var i = 0
    while (i < d) {
      val x = a(i)
      val y = b(i)
      if (x > y) return false
      if (x < y) strict = true
      i += 1
    }
    strict
  }

  /** Coordinate sum — the monotone scoring function used by the
    * sort-filter-skyline pass: if `a` dominates `b` then `sum(a) < sum(b)`.
    */
  def coordSum(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s
  }
}
