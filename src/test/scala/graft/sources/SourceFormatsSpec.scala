package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.TestSpark

/** Source-format breadth: the same documents relation round-trips through
  * CSV and JSON-lines — the two wire formats an ingestion edge actually
  * receives — and reads back row-identical to the parquet source (schema
  * supplied explicitly on read: a production edge never infers). */
class SourceFormatsSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def fingerprint(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(concat_ws("|", col("doc_id"), md5(col("text")), col("lang"),
        col("source"), col("n_chars")).as("f"))
      .collect().map(_.getString(0)).toSet

  test("documents round-trip through CSV and JSONL without loss") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = fingerprint(docs)

    docs.write.option("header", "true").option("escape", "\"").csv(s"$dir/csv")
    docs.write.json(s"$dir/jsonl")

    // multiLine + explicit quote/escape: the round-trip contract must hold
    // even if a testdata regeneration introduces embedded newlines in text —
    // without these options the reader would split quoted records at the
    // newline and the assertion would fail for a reader-option reason, not
    // an ingestion-contract one.
    val csv = spark.read.schema(schema).option("header", "true")
      .option("multiLine", "true").option("quote", "\"").option("escape", "\"")
      .csv(s"$dir/csv")
    val jsonl = spark.read.schema(schema).json(s"$dir/jsonl")
    assert(fingerprint(csv) == want, "CSV round-trip diverged")
    assert(fingerprint(jsonl) == want, "JSONL round-trip diverged")
  }

  test("malformed CSV rows drop under DROPMALFORMED, survive as nulls under PERMISSIVE") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/rows.csv"),
      "1,ok text,en,src0,7\nnot-a-long,broken,xx,src1,bad\n3,fine,de,src2,4\n")
    // collect(), not count(): a bare count prunes every column off the
    // CSV parse, so nothing is ever "malformed" — the classic trap.
    val strict = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .csv(s"$dir/rows.csv")
    assert(strict.collect().length == 2)
    val permissive = spark.read.schema(schema).csv(s"$dir/rows.csv")
    val rows = permissive.collect()
    assert(rows.length == 3)
    assert(rows.count(_.isNullAt(0)) == 1)
  }
}
