package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join shapes. AQE's skew-join handling re-splits
  * oversized SORT-MERGE partitions at runtime, but it cannot help when the
  * skew sits under a hash aggregation or when the planner has already
  * locked a different strategy — [[saltedJoin]] is the explicit-control
  * variant a pipeline applies to a KNOWN hot key distribution (the power-law
  * entity in a 100 TB event log: one user/document/token carrying a
  * double-digit percentage of rows).
  */
object JoinOps {

  /** Inner equi-join of a LARGE skewed `big` side with a medium `small`
    * side (too big or unwanted to broadcast), with the hot-key shuffle
    * spread over `salt` reducers: `big` rows get a deterministic salt in
    * [0, salt) hashed from the whole row (so a hot key's rows spread
    * uniformly), `small` rows replicate once per salt value, and the join
    * key becomes (key, salt). Row-identical to the unsalted inner join —
    * each big row meets each matching small row exactly once, in exactly
    * one salt bucket.
    *
    * Cost: `small` is scanned/shuffled ×`salt` — the standard trade (salt
    * bounded, hot key unbounded). Both inputs must not already contain the
    * working column `_salt`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1 && salt <= 4096, s"salt must be in 1..4096: $salt")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not carry a _salt column")
    val b = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
