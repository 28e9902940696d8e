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
