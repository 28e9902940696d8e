package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {

  private def piiRow(text: String): (Long, Long, Long, String) = {
    val spark = TestSpark.spark
    import spark.implicits._
    val r = Seq(text).toDF("text")
      .select(TextOps.piiCountCols(col("text")) :+
        TextOps.redactPiiCol(col("text")).as("red"): _*)
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("redactPiiCol replaces urls, emails, phones; counts mirror replacements") {
    val (u1, e1, p1, r1) = piiRow("email a@b.co visit https://c.de/path-1 call 111-222-3333")
    assert((u1, e1, p1) == ((1L, 1L, 1L)))
    assert(r1 == "email <EMAIL> visit <URL> call <PHONE>")
    val (u2, e2, p2, r2) = piiRow("contact alice@example.com or bob.smith@test.org")
    assert((u2, e2, p2) == ((0L, 2L, 0L)))
    assert(r2 == "contact <EMAIL> or <EMAIL>")
  }

  test("phone- and email-like substrings inside a URL redact as the URL, not separately") {
    // The staged order (URL first) must swallow the embedded phone pattern;
    // an unstaged count would report n_phone = 1 here.
    val (u, e, p, red) = piiRow("fetch https://x.com/a/123-456-7890 today")
    assert((u, e, p) == ((1L, 0L, 0L)), s"got ($u, $e, $p)")
    assert(red == "fetch <URL> today")
  }

  test("pii ops pass through clean and degenerate text") {
    assert(piiRow("no pii here at all") == ((0L, 0L, 0L, "no pii here at all")))
    assert(piiRow("") == ((0L, 0L, 0L, "")))
  }
}
