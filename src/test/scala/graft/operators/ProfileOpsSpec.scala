package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ProfileOpsSpec extends AnyFunSuite {

  test("profile: nulls, distincts, stringified min/max per column") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (None, Some("a")), (Some(3L), Some("a"))
    ).toDF("num", "s")
    val got = ProfileOps.profile(df, Seq("num", "s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSet
    assert(got == Set(
      ("num", 4L, 1L, 2L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("an all-null column profiles to zero distincts and null min/max") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "gone")
    val row = ProfileOps.profile(df, Seq("gone")).collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L && // n_rows, n_null
      row.getLong(3) == 0L && row.isNullAt(4) && row.isNullAt(5))
  }

  test("keySkew: hand-computed percentiles, hot key, skew ratio") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Counts: a×5, b×2, c×2, d×1 → histogram {1:1, 2:2, 5:1}, cum
    // {1→1, 2→3, 5→4} of 4 keys: p50 = 2 (300 ≥ 200), p90 = 5
    // (400 ≥ 360), p99 = 5. skew = 5·4·1000 // 10 = 2000.
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("k")
    val r = ProfileOps.keySkew(df, "k").collect().head
    graft.core.Caches.releaseAll()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)) ==
      ((10L, 4L, 5L, "a")))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((2L, 5L, 5L, 2000L)))
  }

  test("keySkew: hot-key ties break on the STRING value; uniform keys read skew 1000") {
    val spark = TestSpark.spark
    import spark.implicits._
    // Keys 10 and 9 both ×3 — the string tie-break picks "10" < "9".
    val tied = (Seq.fill(3)(10L) ++ Seq.fill(3)(9L) ++ Seq(1L)).toDF("k")
    val rt = ProfileOps.keySkew(tied, "k").collect().head
    graft.core.Caches.releaseAll()
    assert(rt.getString(3) == "10")
    // A perfectly uniform distribution: max = mean → skew_x1000 = 1000.
    val uni = (1L to 4L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val ru = ProfileOps.keySkew(uni, "k").collect().head
    graft.core.Caches.releaseAll()
    assert(ru.getLong(2) == 3L && ru.getLong(7) == 1000L)
    assert((ru.getLong(4), ru.getLong(5), ru.getLong(6)) == ((3L, 3L, 3L)))
  }

  test("column names that would break the stack() interpolation are rejected") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("ok", "with`tick")
    val e = intercept[IllegalArgumentException] {
      ProfileOps.profile(df, Seq("ok", "with`tick"))
    }
    assert(e.getMessage.contains("with`tick"))
    intercept[IllegalArgumentException] {
      ProfileOps.profile(df, Seq("has'quote"))
    }
  }
}
